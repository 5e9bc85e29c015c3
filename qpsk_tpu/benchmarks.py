"""Throughput benchmarks (the driver-facing numbers, BASELINE.md targets).

``rx_throughput`` measures the aggregate demod rate — RRC matched filter +
timing + decimation + Costas + slicing — in samples/second, channels on the
batch axis, (if >1 device) channel axis sharded over a 'dp' mesh.

Measurement discipline (matters on tunneled/remote TPU backends):
* inputs are generated **on device** (host→device PCM uploads would measure
  the tunnel, not the chip);
* completion is forced by a device-side scalar reduction read back to host —
  ``block_until_ready`` is not a reliable fence on relayed backends, and
  ``np.asarray`` of a full output would measure the transfer;
* iterations chain the state pytree so XLA cannot overlap them.

Measured on one TPU v5e chip (2026-08-17): **8.1 Gsamples/s** at 2048
channels — ~650x the 12.5 MS/s per-chip share of the BASELINE 100 MS/s
v5e-8 target.  Two things matter equally: the fused rx_stream path (one
mix + one split block-FIR matmul + one-hot decimation + a single Pallas
Costas kernel with the channel batch on the lanes), and amortizing the
relayed backend's ~1.8 ms per-launch cost over an in-jit fori_loop of
chained steps — per-call timing measures the tunnel, not the chip (a null
``x*2`` jit costs 1.76 ms/call here).  The naive per-frame scan with a
``take_along_axis`` decimator ran 30x slower than the fused path.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def tx_throughput(channels: int | None = None, frames: int | None = None,
                  iters: int | None = None, inner: int | None = None) -> dict:
    """Aggregate TX modulation rate (mod + zero-stuff + RRC + mix + PCM)."""
    from qpsk_tpu import ModemConfig, tx_init
    from qpsk_tpu.modem import tx_stream

    cfg = ModemConfig()
    platform = jax.devices()[0].platform
    channels = channels or (2048 if platform == "tpu" else 16)
    frames = frames or (16 if platform == "tpu" else 4)
    iters = iters or (20 if platform == "tpu" else 3)
    # see rx_throughput for why inner>1 matters.  TX defaults to 1 on TPU:
    # the fori_loop'd TX graph compiled for >30 min on the remote backend
    # (even after replacing the zero-stuff scatter with concat+reshape),
    # so the reported TX rate is a per-dispatch measure that understates
    # the chip by the ~1.8 ms launch overhead.  Round-2 item: find the TX
    # compile blow-up and raise this default.
    inner = inner or (1 if platform == "tpu" else 2)
    nsym = cfg.symbols_per_frame
    nsamples = channels * frames * cfg.frame_size

    key = jax.random.key(0)
    bits = (jax.random.uniform(key, (channels, frames, 2 * nsym))
            < 0.5).astype(jnp.int32)
    state = tx_init(cfg, batch_shape=(channels,))

    @jax.jit
    def step(st, b):
        def body(_, carry):
            st, acc = carry
            st, pcm = tx_stream(cfg, st, b, tx_offset_hz=50.0)
            return st, acc + jnp.sum(pcm.astype(jnp.int32))
        st, acc = jax.lax.fori_loop(
            0, inner, body, (st, jnp.zeros((), jnp.int32)))
        return st, acc

    st, chk = step(state, bits)
    float(np.asarray(chk))
    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        st, chk = step(st, bits)
    float(np.asarray(chk))
    dt = time.perf_counter() - t0
    sps = nsamples * inner * iters / dt
    return {"metric": "tx_mod_throughput", "value": round(sps, 1),
            "unit": "samples/s", "platform": platform, "channels": channels}


def rx_throughput(channels: int | None = None, frames: int | None = None,
                  iters: int | None = None, inner: int | None = None) -> dict:
    from qpsk_tpu import ModemConfig, rx_init
    from qpsk_tpu.modem import rx_stream

    cfg = ModemConfig()
    ndev = len(jax.devices())
    platform = jax.devices()[0].platform
    channels = channels or (2048 if platform == "tpu" else 16)
    frames = frames or (16 if platform == "tpu" else 4)
    iters = iters or (20 if platform == "tpu" else 3)
    # inner: chained steps per dispatch.  A single relayed-executable launch
    # costs ~1.8 ms on the tunneled backend (measured: a null x*2 jit) —
    # comparable to the whole pipeline's device time — so per-call timing
    # measures the tunnel, not the chip.  A lax.fori_loop over the step
    # (state chained, bits checksummed into the carry so nothing dead-code
    # eliminates) amortizes one dispatch over `inner` steps; this is the
    # steady-state streaming rate a real deployment sees.
    inner = inner or (10 if platform == "tpu" else 2)
    nsamples = channels * frames * cfg.frame_size

    key = jax.random.key(0)
    pcm = (jax.random.normal(key, (channels, frames, cfg.frame_size))
           * 8000.0).astype(jnp.int16)
    state = rx_init(cfg, batch_shape=(channels,))

    if ndev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        pcm = jax.device_put(pcm, NamedSharding(mesh, P("dp")))
        state = jax.device_put(state, NamedSharding(mesh, P("dp")))

    @jax.jit
    def step(st, x):
        def body(_, carry):
            st, acc = carry
            st, out = rx_stream(cfg, st, x)
            return st, acc + jnp.sum(out.bits)
        st, acc = jax.lax.fori_loop(
            0, inner, body, (st, jnp.zeros((), jnp.int32)))
        return st, acc

    st, chk = step(state, pcm)
    float(np.asarray(chk))                      # compile + hard sync

    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        st, chk = step(st, pcm)
    float(np.asarray(chk))                      # hard sync on the chain
    dt = time.perf_counter() - t0

    sps = nsamples * inner * iters / dt
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
