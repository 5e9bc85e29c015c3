"""Modulation-family walkthrough: one packet stack, four constellations.

The link picks its constellation for the channel it has — BPSK at the
low-SNR end, QPSK (the bit-exact reference flagship), 8PSK / 16QAM when
SNR affords the rate.  Everything else is shared: the RRC front-end, the
(decision-directed) carrier loop, CRC/scramble/interleave framing, the
CRC-scored sync hunt that also resolves each constellation's n_rot-fold
carrier ambiguity, and the tracked extractors.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/modulation_family.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from qpsk_tpu import (ModemConfig, rx_acquire_hz, rx_init, rx_stream,
                      tx_init, tx_stream)
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.ops.acquire import hz_to_costas_freq
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import default_max_lag, extract_packets_tracked, find_sync

# each mode at a comfortable operating SNR (see the soaked floors in
# docs/per_vs_snr_*.jsonl: BPSK 8 dB, QPSK 12, 8PSK 16, 16QAM 18)
MODES = [("bpsk", 10.0), ("qpsk", 14.0), ("8psk", 18.0), ("16qam", 20.0)]
NFRAMES, OFFSET_HZ = 60, 35.0
pcfg = PacketConfig(payload_bytes=30)

rng = np.random.default_rng(7)
payload = jnp.asarray(rng.integers(0, 2, (NFRAMES, 240), dtype=np.int32))

print(f"{'mode':>6} {'bits/sym':>8} {'snr':>5} {'sync':>4} "
      f"{'packets':>7} {'per':>6} {'kbit/s @2400 baud':>17}")
for name, snr_db in MODES:
    cfg = ModemConfig(modulation=name, agc=(name == "16qam"))

    # --- TX: re-frame the packet stream into whole symbol-aligned modem
    # frames (8PSK's 3 bits/symbol does not divide the packet length)
    chan = assemble_packet(pcfg, payload).ravel()
    mfb = cfg.bits_per_frame
    pad = (-chan.size) % mfb
    if pad:
        chan = jnp.concatenate(
            [chan, jnp.asarray(rng.integers(0, 2, (pad,), dtype=np.int32))])
    _, pcm = tx_stream(cfg, tx_init(cfg), chan.reshape(-1, mfb),
                       tx_offset_hz=OFFSET_HZ)

    # --- channel
    sp = float(jnp.mean((pcm.astype(jnp.float32) / cfg.pcm_scale) ** 2))
    pcm = awgn_pcm(jax.random.key(1), pcm, snr_db=snr_db, signal_power=sp)

    # --- RX: M-power FFT acquisition seeds the (narrower-pull-in)
    # decision-directed loop, then demod + CRC-scored sync + extraction
    est = rx_acquire_hz(cfg, pcm)
    state = rx_init(cfg, acq_freq=hz_to_costas_freq(est, cfg.rs))
    _, out = jax.jit(lambda s, x: rx_stream(cfg, s, x))(state, pcm)

    bits = out.bits.ravel()
    skip = 10 * mfb                      # Costas transient, symbol-aligned
    sync = find_sync(pcfg, bits[skip:], max_lag=default_max_lag(pcfg),
                     probe_frames=4, modulation=name)
    navail = (bits.size - skip - int(sync.bit_lag)) // pcfg.frame_bits
    rx = extract_packets_tracked(pcfg, bits[skip:], sync, navail,
                                 modulation=name)
    ok = np.asarray(rx.crc_ok)
    rate_kbps = 2.4 * cfg.bits_per_symbol
    print(f"{name:>6} {cfg.bits_per_symbol:>8} {snr_db:>5.1f} "
          f"{int(sync.score):>3}/4 {int(ok.sum()):>3}/{navail:>3} "
          f"{1.0 - ok.mean():>6.3f} {rate_kbps:>17.1f}")
