"""24/7 streaming receiver walkthrough: bursts, dead air, squelch.

The batch API (examples/end_to_end.py) asks the caller to manage sync and
framing; this is the deployment surface instead — ``StreamModulator`` /
``StreamDemodulator`` (qpsk_tpu.runtime) with arbitrary chunk sizes,
automatic sync, CRC-tracked slips, squelch-gated hunting, and resync
after signal loss.  The same machinery backs the CLI duplex pipe:
``qpsk_tpu tx --stream-in - | qpsk_tpu rx - --stream``.

Run:  PYTHONPATH=. python examples/streaming_receiver.py
(CPU is fine; set JAX_PLATFORMS=cpu to force it.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from qpsk_tpu import ModemConfig
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.packet import PacketConfig
from qpsk_tpu.runtime import StreamDemodulator, StreamModulator

cfg = ModemConfig()
pcfg = PacketConfig(payload_bytes=30)
rng = np.random.default_rng(0)


def burst(npkts, seed, snr_db=12.0):
    """One transmission: npkts packets of random payload -> noisy PCM."""
    payloads = rng.integers(0, 2, (npkts, 8 * pcfg.payload_bytes),
                            dtype=np.int32)
    mod = StreamModulator(cfg, pcfg, tx_offset_hz=50.0)
    pcm = mod.push(payloads)
    sp = float(np.mean((pcm / cfg.pcm_scale) ** 2))
    noisy = awgn_pcm(jax.random.key(seed), jnp.asarray(pcm),
                     snr_db=snr_db, signal_power=sp)
    return payloads, np.asarray(noisy)


def dead_air(nframes, seed):
    return np.random.default_rng(seed).normal(
        0, 600.0, nframes * cfg.frame_size).astype(np.int16)


# a day in the life: burst -> long silence -> burst (different payloads)
p1, s1 = burst(25, seed=1)
p2, s2 = burst(25, seed=2)
stream = np.concatenate([s1, dead_air(120, 3), s2])

# squelch_db: the sync hunt only runs while the blind carrier-SNR
# estimate says a signal is present; dead air is discarded, and the loop
# cold-restarts (FFT re-acquisition) when the carrier returns
demod = StreamDemodulator(cfg, pcfg, squelch_db=5.0)

good = 0
pos = 0
chunks = np.random.default_rng(4)
while pos < stream.size:                # arbitrary chunk sizes, as from
    n = int(chunks.integers(500, 8000))  # a sound card or SDR pipe
    for pkt in demod.push(stream[pos:pos + n]):
        if pkt.crc_ok:
            good += 1
    pos += n
good += sum(p.crc_ok for p in demod.flush())

c = demod.counters
wanted = {p.tobytes() for p in np.concatenate([p1, p2]).astype(np.uint8)}
print(f"decoded {good} CRC-good packets across two bursts "
      f"({len(wanted)} sent; the sync transient costs the burst heads)")
print(f"frames={c.frames}  resyncs={c.resyncs}  "
      f"offset={c.detected_offset_hz:+.1f} Hz  "
      f"carrier_snr={c.carrier_snr_db:.1f} dB  dcd={c.carrier_detect}")
assert good >= 25 and c.resyncs >= 1
print("ok")

# --- checkpoint / resume (24/7 operation): a restarted process picks up
# the receiver exactly where it stopped — buffers, sync epoch, counters
import tempfile

with tempfile.TemporaryDirectory() as td:
    ckpt = f"{td}/rx.npz"
    p3, s3 = burst(20, seed=5)
    cut = s3.size // 2 + 173

    d1 = StreamDemodulator(cfg, pcfg)
    first = [p for p in d1.push(s3[:cut]) if p.crc_ok]
    d1.save(ckpt)                       # process "dies" here

    d2 = StreamDemodulator(cfg, pcfg)   # new process, same configs
    d2.load(ckpt)
    second = [p for p in d2.push(s3[cut:]) if p.crc_ok]
    second += [p for p in d2.flush() if p.crc_ok]

    ref = StreamDemodulator(cfg, pcfg)
    uninterrupted = [p for p in ref.push(s3) if p.crc_ok]
    uninterrupted += [p for p in ref.flush() if p.crc_ok]
    assert len(first) + len(second) == len(uninterrupted)
    print(f"resume: {len(first)}+{len(second)} packets across the restart "
          f"== {len(uninterrupted)} uninterrupted")
