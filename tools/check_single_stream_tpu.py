"""Hardware check: a SINGLE-channel stream on TPU rides the fused kernels
via channel padding (modem._rx_stream_fused_padded) and still decodes
packets end-to-end — sync, CRC, bit-exact payloads — matching the scan
lowering's decode.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_single_stream_tpu.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, rx_init, tx_init
from qpsk_tpu.channel import awgn_pcm
from qpsk_tpu.modem import rx_stream, tx_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import default_max_lag, extract_packets_tracked, find_sync

assert jax.devices()[0].platform == "tpu", jax.devices()

cfg = ModemConfig()                     # auto -> padded kernel path at c=1
pcfg = PacketConfig(payload_bytes=30)
rng = np.random.default_rng(11)
payload = rng.integers(0, 2, (40, 240), dtype=np.int32)
_, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg,
                                                      jnp.asarray(payload)),
                   tx_offset_hz=50.0)
sp = float(jnp.mean((pcm.astype(jnp.float32) / 16384.0) ** 2))
pcm = awgn_pcm(jax.random.key(11), pcm, snr_db=10.0, signal_power=sp)
pcm1 = pcm[None]                         # (1, F, frame)


def decode(c):
    _, out = jax.jit(lambda s, x: rx_stream(c, s, x))(
        rx_init(c, batch_shape=(1,)), pcm1)
    bits = np.asarray(out.bits)[0].reshape(-1)
    skip = 8 * pcfg.frame_bits
    sync = find_sync(pcfg, jnp.asarray(bits[skip:]),
                     max_lag=default_max_lag(pcfg), probe_frames=4)
    nav = (bits.size - skip - int(sync.bit_lag)) // pcfg.frame_bits
    rx = extract_packets_tracked(pcfg, jnp.asarray(bits[skip:]), sync, nav)
    return int(sync.score), np.asarray(rx.crc_ok), np.asarray(rx.payload_bits)


score_k, ok_k, pay_k = decode(cfg)
score_s, ok_s, pay_s = decode(dataclasses.replace(cfg, costas_impl="scan"))
wanted = {p.tobytes() for p in payload.astype(np.int32)}
good_k = sum(p.astype(np.int32).tobytes() in wanted
             for p in pay_k[ok_k.astype(bool)])
print(f"padded-kernel: sync={score_k} crc_ok={ok_k.sum()}/{ok_k.size} "
      f"bit_exact={good_k}")
print(f"scan twin:     sync={score_s} crc_ok={ok_s.sum()}/{ok_s.size}")
assert score_k == 4 and ok_k.sum() >= 30 and good_k == ok_k.sum()
assert ok_k.sum() >= ok_s.sum() - 1   # no decode-quality loss vs the scan
print("SINGLE-STREAM-TPU-CHECK-PASS")
