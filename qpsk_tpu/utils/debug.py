"""Debug / observability taps.

The reference's only observability is a scatter-point stream on stderr
behind ``-DTEST_SCATTER`` (qpsk.c:199-201).  Here:

* ``assert_finite`` — jit-compatible NaN/Inf guard over a pytree
  (checkify-based), the sanitizer the C build never had;
* ``scatter_dump`` — the explicit constellation tap: returns (and
  optionally appends to a host-side list via ``io_callback``) the
  derotated symbols, replacing the stderr side channel;
* ``trace`` — a ``jax.profiler`` trace context for timeline capture.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu.ops.cplx import CF32


def assert_finite(tree, name: str = "value"):
    """Raise (via checkify) if any leaf contains NaN/Inf.  Usage:

        err, out = checkify.checkify(fn)(args)   # fn calls assert_finite
        err.throw()

    Or call outside jit for an eager check.
    """
    from jax.experimental import checkify

    for i, leaf in enumerate(jax.tree.leaves(tree)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            checkify.check(jnp.all(jnp.isfinite(leaf)),
                           f"non-finite values in {name}[leaf {i}]")


def eager_assert_finite(tree, name: str = "value") -> None:
    """Host-side finite check (pulls to host; for tests/debugging)."""
    for i, leaf in enumerate(jax.tree.leaves(tree)):
        a = np.asarray(leaf)
        if np.issubdtype(a.dtype, np.floating) and not np.isfinite(a).all():
            raise FloatingPointError(f"non-finite values in {name}[leaf {i}]")


class ScatterTap:
    """Collects constellation points from inside jitted code via
    ``io_callback`` — the framework's version of the reference's stderr
    scatter stream (qpsk.c:199-201), without leaving the compiled graph."""

    def __init__(self):
        self.points: list[np.ndarray] = []

    def _sink(self, re, im):
        self.points.append(np.stack([np.asarray(re).ravel(),
                                     np.asarray(im).ravel()], -1))

    def tap(self, symbols: CF32) -> None:
        """Call inside a jitted function to stream symbols to the host."""
        from jax.experimental import io_callback
        io_callback(self._sink, None, symbols.re, symbols.im, ordered=True)

    def as_array(self) -> np.ndarray:
        return (np.concatenate(self.points, 0)
                if self.points else np.zeros((0, 2), np.float32))


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """``jax.profiler`` timeline capture around a code region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
