"""Throughput benchmarks (the driver-facing numbers, BASELINE.md targets).

``rx_throughput`` measures the aggregate demod rate — RRC matched filter +
timing + Costas + slicing — in samples/second, with channels on the batch
axis and (if >1 device) the channel axis sharded over a 'dp' mesh.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def rx_throughput(channels: int | None = None, frames: int | None = None,
                  iters: int | None = None) -> dict:
    from qpsk_tpu import ModemConfig, rx_init
    from qpsk_tpu.modem import rx_stream

    cfg = ModemConfig()
    ndev = len(jax.devices())
    platform = jax.devices()[0].platform
    channels = channels or (256 if platform == "tpu" else 16)
    frames = frames or (32 if platform == "tpu" else 4)
    iters = iters or (20 if platform == "tpu" else 3)
    nsamples = channels * frames * cfg.frame_size

    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.integers(-16384, 16384,
                                   (channels, frames, cfg.frame_size),
                                   dtype=np.int16))
    state = rx_init(cfg, batch_shape=(channels,))

    if ndev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        pcm = jax.device_put(pcm, NamedSharding(mesh, P("dp")))
        state = jax.device_put(state, NamedSharding(mesh, P("dp")))

    fn = jax.jit(lambda st, x: rx_stream(cfg, st, x))
    st, out = fn(state, pcm)          # compile + warmup
    jax.block_until_ready(out.bits)

    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        st, out = fn(st, pcm)
    jax.block_until_ready(out.bits)
    dt = time.perf_counter() - t0

    sps = nsamples * iters / dt
    per_chip_target = 100e6 / 8.0
    return {
        "metric": "rx_demod_throughput",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / (per_chip_target * ndev), 4),
        "platform": platform,
        "devices": ndev,
        "channels": channels,
    }
