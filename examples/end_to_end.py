"""End-to-end qpsk_tpu walkthrough: packets over an impaired channel.

Run:  PYTHONPATH=. python examples/end_to_end.py
(CPU is fine; set JAX_PLATFORMS=cpu to force it.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from qpsk_tpu import (ModemConfig, rx_acquire_hz, rx_init, rx_stream,
                      tx_init, tx_stream)
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.metrics import evm, per
from qpsk_tpu.ops.acquire import hz_to_costas_freq
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import (default_max_lag,
                           extract_packets_tracked, find_sync)

# --- configuration: the reference design point (2400 baud @ 9600 S/s) ----
cfg = ModemConfig()
pcfg = PacketConfig(payload_bytes=30)   # 240 payload bits + CRC16 = 1 frame
NFRAMES, SNR_DB, OFFSET_HZ = 120, 10.0, 137.0

# --- TX: payload -> CRC/scramble/interleave -> QPSK -> RRC -> carrier ----
rng = np.random.default_rng(0)
payload = jnp.asarray(rng.integers(0, 2, (NFRAMES, 240), dtype=np.int32))
chan_bits = assemble_packet(pcfg, payload)
_, pcm = tx_stream(cfg, tx_init(cfg), chan_bits, tx_offset_hz=OFFSET_HZ)

# --- channel: AWGN at 10 dB over the passband -----------------------------
sig_power = float(jnp.mean((pcm.astype(jnp.float32) / cfg.pcm_scale) ** 2))
noisy = awgn_pcm(jax.random.key(1), pcm, snr_db=SNR_DB, signal_power=sig_power)

# --- RX: acquire -> warm-start Costas -> fused demod ----------------------
est_hz = rx_acquire_hz(cfg, noisy)
state = rx_init(cfg, acq_freq=hz_to_costas_freq(est_hz, cfg.rs))
state, out = rx_stream(cfg, state, noisy)
print(f"acquisition: {float(est_hz):+7.2f} Hz   "
      f"tracked: {float(jnp.mean(out.freq_hz[-10:])):+7.2f} Hz   "
      f"(true {OFFSET_HZ:+.0f})")

m = evm(CF32(out.symbols.re[8:], out.symbols.im[8:]))
print(f"EVM (post-transient): {float(jnp.mean(m.evm_rms)) * 100:.1f}%")

# --- packets: resolve phase ambiguity + alignment by CRC ------------------
bits = out.bits.ravel()
skip = 8 * pcfg.frame_bits
sync = find_sync(pcfg, bits[skip:], max_lag=default_max_lag(pcfg),
                 probe_frames=4)
navail = (bits.size - skip - int(sync.bit_lag)) // pcfg.frame_bits
rx = extract_packets_tracked(pcfg, bits[skip:], sync, navail)
print(f"sync: rotation {int(sync.rotation) * 90}°, lag {int(sync.bit_lag)} "
      f"bits, score {int(sync.score)}/4")
print(f"packets: {int(np.asarray(rx.crc_ok).sum())}/{navail} CRC-pass "
      f"(PER {float(per(rx.crc_ok)):.3f})")

# --- coded link: the same pipeline with rate-1/2 FEC + soft decisions -----
# At 5-6 dB SNR the uncoded link above cannot sync; the convolutional code
# (K=7, (133,171)) decoded with soft-decision Viterbi keeps delivering.
from qpsk_tpu.ops.modmap import demod_soft
from qpsk_tpu.sync import extract_packets_soft_tracked

pcfg_c = PacketConfig(payload_bytes=30, fec=True)   # 524 channel bits/packet
chan_c = assemble_packet(pcfg_c, payload).ravel()
npad = (-chan_c.size) % (2 * cfg.symbols_per_frame)
chan_c = jnp.concatenate([chan_c, jnp.zeros((npad,), jnp.int32)])
_, pcm_c = tx_stream(cfg, tx_init(cfg),
                     chan_c.reshape(-1, 2 * cfg.symbols_per_frame),
                     tx_offset_hz=OFFSET_HZ)
sp = float(jnp.mean((pcm_c.astype(jnp.float32) / cfg.pcm_scale) ** 2))
noisy_c = awgn_pcm(jax.random.key(2), pcm_c, snr_db=6.0, signal_power=sp)
_, out_c = rx_stream(cfg, rx_init(cfg), noisy_c)

bits_c = out_c.bits.ravel()
llrs_c = demod_soft(CF32(out_c.symbols.re.reshape(-1),
                         out_c.symbols.im.reshape(-1)))
skip_c = 10 * 2 * cfg.symbols_per_frame
sync_c = find_sync(pcfg_c, bits_c[skip_c:],
                   max_lag=default_max_lag(pcfg_c), probe_frames=4)
nav_c = (bits_c.size - skip_c - int(sync_c.bit_lag)) // pcfg_c.frame_bits
rx_c = extract_packets_soft_tracked(pcfg_c, llrs_c[skip_c:], sync_c, nav_c)
print(f"coded @ 6 dB: {int(np.asarray(rx_c.crc_ok).sum())}/{nav_c} CRC-pass "
      f"(PER {float(per(rx_c.crc_ok)):.3f}) — soft Viterbi, slip-tracked")

# --- FDM: three independent channels in one wideband stream ---------------
# A critically-sampled polyphase-DFT bank puts N/2-1 unmodified modem
# channels on slots of an N*fs wideband; the batched RX decodes them all
# as its ordinary channel axis.
from qpsk_tpu.fdm import FdmConfig, fdm_demux, fdm_mux

fcfg = FdmConfig(nslots=8)
pay3 = jnp.asarray(rng.integers(0, 2, (fcfg.nchan, 40, 240), dtype=np.int32))
_, pcm3 = tx_stream(cfg, tx_init(cfg, batch_shape=(fcfg.nchan,)),
                    assemble_packet(pcfg, pay3), tx_offset_hz=50.0)
wide = fdm_mux(fcfg, pcm3.reshape(fcfg.nchan, -1))
spw = float(jnp.mean((wide.astype(jnp.float32) / cfg.pcm_scale) ** 2))
wide = awgn_pcm(jax.random.key(3), wide, snr_db=18.0, signal_power=spw)
back = fdm_demux(fcfg, wide)
npad3 = (-back.shape[-1]) % cfg.frame_size
back = jnp.concatenate([back, jnp.zeros((fcfg.nchan, npad3), back.dtype)],
                       axis=-1)
_, out3 = rx_stream(cfg, rx_init(cfg, batch_shape=(fcfg.nchan,)),
                    back.reshape(fcfg.nchan, -1, cfg.frame_size))
for c in range(fcfg.nchan):
    b3 = out3.bits[c].ravel()
    s3 = find_sync(pcfg, b3[skip:], max_lag=default_max_lag(pcfg),
                   probe_frames=4)
    n3 = (b3.size - skip - int(s3.bit_lag)) // pcfg.frame_bits
    r3 = extract_packets_tracked(pcfg, b3[skip:], s3, n3)
    print(f"FDM chan {c} @ {fcfg.slot_center_hz(c, cfg.center):7.0f} Hz: "
          f"{int(np.asarray(r3.crc_ok).sum())}/{n3} CRC-pass")
