"""Acceptance test: the full real-sound-card deployment chain.

Composes every impairment a physical audio link stacks on the modem at
once — none of which the reference's noiseless spool-file loopback
(qpsk.c:289-359) models:

    TX @ 9600 S/s, +50 Hz carrier offset
      -> polyphase upsample to the 48 kHz device rate (the D/A)
      -> 80 ppm sample-clock mismatch at the device rate (the A/D crystal)
      -> AWGN at 14 dB
      -> -20 dB mis-set input level
      -> polyphase downsample back to 9600
      -> StreamDemodulator(agc=True, timing_mode="tracking"), arbitrary
         push chunks

and requires every packet to decode bit-exactly.  Each feature is tested
in isolation elsewhere (test_resample / test_agc /
test_channel_impairments / test_runtime); this is the composition — where
the interactions live.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, tx_init
from qpsk_tpu.channel import awgn_pcm, clock_offset_pcm
from qpsk_tpu.modem import tx_stream
from qpsk_tpu.ops.resample import resample_pcm
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.runtime import StreamDemodulator


def test_soundcard_link_end_to_end():
    cfg = ModemConfig(timing_mode="tracking", agc=True)
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, (40, 240), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload),
                       tx_offset_hz=50.0)

    dev = resample_pcm(pcm.reshape(-1), 9600, 48000)
    dev = clock_offset_pcm(dev, 80e-6, frac_offset=-0.7)
    sp = float(jnp.mean((dev.astype(jnp.float32) / 16384.0) ** 2))
    dev = awgn_pcm(jax.random.key(1), dev, snr_db=14.0, signal_power=sp)
    dev = jnp.clip(jnp.round(dev.astype(jnp.float32) * 0.1),
                   -32768, 32767).astype(jnp.int16)       # -20 dB level
    back = np.asarray(resample_pcm(dev, 48000, 9600))

    demod = StreamDemodulator(cfg, pcfg)
    pkts = []
    for i in range(0, len(back), 4000):                   # odd chunk size
        pkts += demod.push(back[i:i + 4000])
    pkts += demod.flush()

    good = [p for p in pkts if p.crc_ok]
    assert len(pkts) >= 28, len(pkts)
    assert len(good) >= 0.95 * len(pkts), (len(good), len(pkts))
    tx_rows = np.asarray(payload)
    exact = sum(any(np.array_equal(p.payload, t) for t in tx_rows)
                for p in good)
    assert exact == len(good), (exact, len(good))
    assert demod.counters.resyncs == 0, demod.counters
    assert abs(demod.counters.detected_offset_hz - 50.0) < 5.0
