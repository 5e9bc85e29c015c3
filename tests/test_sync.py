"""Phase-ambiguity resolution and packet alignment tests."""

import numpy as np
import jax.numpy as jnp

from qpsk_tpu.ops.cplx import from_complex
from qpsk_tpu.ops.modmap import bits_to_symbols, demod_bits
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.sync import extract_packets, find_sync, rotate_dibits


def _demod_rotated(bits_tx, k):
    """Slice TX symbols as seen through a Costas lock at 45° + k*90°."""
    syms = bits_to_symbols(jnp.asarray(bits_tx))
    z = (np.asarray(syms.re) + 1j * np.asarray(syms.im)) * np.exp(
        1j * (np.pi / 4 + k * np.pi / 2))
    return demod_bits(from_complex(z.astype(np.complex64)))


def test_rotate_dibits_inverts_lock_rotation():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 256, dtype=np.int32)
    for k in range(4):
        sliced = _demod_rotated(bits, k)
        # rotating the received constellation by -k (i.e. 4-k) undoes it
        fixed = rotate_dibits(sliced, (4 - k) % 4)
        np.testing.assert_array_equal(np.asarray(fixed), bits)


def test_rotate_dibits_identity_and_composition():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (3, 64), dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(rotate_dibits(bits, 0)), bits)
    a = rotate_dibits(rotate_dibits(bits, 1), 1)
    b = rotate_dibits(bits, 2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_find_sync_locates_lag_and_rotation():
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(2)
    nframes = 6
    payload = jnp.asarray(rng.integers(0, 2, (nframes, 240), dtype=np.int32))
    stream = assemble_packet(pcfg, payload).ravel()
    # bury the stream at a known odd offset inside junk, through a k=3 lock
    junk = rng.integers(0, 2, 100, dtype=np.int32)
    full_tx = np.concatenate([junk, np.asarray(stream)])
    sliced = _demod_rotated(full_tx, 3)

    sync = find_sync(pcfg, sliced, max_lag=256, probe_frames=3)
    assert int(sync.score) == 3
    assert int(sync.bit_lag) == 100
    assert int(sync.rotation) == 1  # (4 - 3) % 4

    rx = extract_packets(pcfg, sliced, sync, nframes)
    assert bool(rx.crc_ok.all())
    np.testing.assert_array_equal(np.asarray(rx.payload_bits), payload)


def test_find_sync_no_lock_scores_zero():
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(3)
    noise = jnp.asarray(rng.integers(0, 2, 4096, dtype=np.int32))
    sync = find_sync(pcfg, noise, max_lag=256, probe_frames=3)
    assert int(sync.score) == 0


def test_rotate_soft_consistent_with_hard():
    """Property: hard-slicing a soft-rotated LLR stream equals hard-rotating
    the hard-sliced stream, for every rotation (the two rotation walks are
    the same group action in different domains)."""
    import numpy as np
    import jax.numpy as jnp
    from qpsk_tpu.sync import rotate_dibits, rotate_soft
    rng = np.random.default_rng(0)
    llrs = jnp.asarray(rng.normal(size=(512,)).astype(np.float32))
    hard = (llrs < 0).astype(jnp.int32)
    for r in range(4):
        a = np.asarray((rotate_soft(llrs, r) < 0).astype(jnp.int32))
        b = np.asarray(rotate_dibits(hard, r))
        assert np.array_equal(a, b), r
