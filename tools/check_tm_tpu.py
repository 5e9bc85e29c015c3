"""Hardware check: the zero-glue tm fast path (front-end kernel emitting
time-major delayed picks -> fused Costas kernel with block-rate trace) vs
the composed non-tm path, on the real TPU.

The tm mode must move data, not bits: in-kernel transpose, delay scratch,
and the trace_blocks codegen change must leave every value identical to
the kernel-front-end + host delay/fold + per-symbol-trace composition.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_tm_tpu.py
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from qpsk_tpu import ModemConfig, rx_init
from qpsk_tpu import modem as modem_mod
from qpsk_tpu.modem import rx_stream

assert jax.devices()[0].platform == "tpu", jax.devices()

from qpsk_tpu.config import TAU

CASES = [
    ("plain", ModemConfig(frontend_impl="pallas", costas_impl="pallas")),
    ("gear", ModemConfig(frontend_impl="pallas", costas_impl="pallas",
                         loop_bw_track=TAU / 200.0)),
    # round 4: the generic family + AGC ride the tm path too — the DD
    # kernel's packed-label slicer and the in-kernel per-frame gains must
    # leave every value identical to the composed path (XLA agc_stream +
    # transpose fold + downstream cmp slicer)
    ("8psk", ModemConfig(modulation="8psk", frontend_impl="pallas",
                         costas_impl="pallas")),
    ("16qam+agc", ModemConfig(modulation="16qam", agc=True,
                              frontend_impl="pallas",
                              costas_impl="pallas")),
]

for gear, cfg in CASES:
    c, nframes = 256, 8
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.integers(-12000, 12000,
                                   (c, nframes, cfg.frame_size),
                                   dtype=np.int16))
    st = rx_init(cfg, batch_shape=(c,))

    assert modem_mod._use_tm_path(cfg, (c,), cfg.frame_size, nframes, True)
    st_tm, out_tm = jax.jit(lambda s, x: rx_stream(cfg, s, x))(st, pcm)

    orig = modem_mod._use_tm_path
    modem_mod._use_tm_path = lambda *a, **k: False
    try:
        st_nt, out_nt = jax.jit(lambda s, x: rx_stream(cfg, s, x))(st, pcm)
    finally:
        modem_mod._use_tm_path = orig

    checks = [
            ("bits", out_tm.bits, out_nt.bits),
            ("sym.re", out_tm.symbols.re, out_nt.symbols.re),
            ("sym.im", out_tm.symbols.im, out_nt.symbols.im),
            ("freq_hz", out_tm.freq_hz, out_nt.freq_hz),
            ("index", out_tm.timing_index, out_nt.timing_index),
            ("decim_delay", st_tm.decim_delay.re, st_nt.decim_delay.re),
            ("costas.phase", st_tm.costas.phase, st_nt.costas.phase),
            ("costas.freq", st_tm.costas.freq, st_nt.costas.freq),
            ("fir_tail", st_tm.fir_tail.re, st_nt.fir_tail.re)]
    if cfg.agc:
        checks.append(("agc", st_tm.agc, st_nt.agc))
    for name, a, b in checks:
        a, b = np.asarray(a), np.asarray(b)
        same = (a == b).mean()
        print(f"case={gear} {name}: exact-match {same:.6f}")
        assert same == 1.0, (gear, name)
print("TM-TPU-CHECK-PASS")
