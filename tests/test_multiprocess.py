"""True multi-process distributed test (SURVEY.md §4(d)): two JAX
processes wired with jax.distributed over localhost, 4 virtual CPU devices
each, running the time-parallel sharded front-end over the 8-device global
mesh and checking against the single-process serial chain.

This exercises the cross-process path the single-process 8-device tests
can't: global mesh construction, process-spanning NamedSharding, and the
multi-controller runtime itself.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.device_count() == 4 * nproc, jax.devices()
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qpsk_tpu import ModemConfig, tx_init
from qpsk_tpu.modem import tx_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet
from qpsk_tpu.parallel.stream import rx_frontend_timeparallel

cfg = ModemConfig()
pcfg = PacketConfig(payload_bytes=30)
rng = np.random.default_rng(0)
payload = jnp.asarray(rng.integers(0, 2, (16, 240), dtype=np.int32))
_, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload),
                   tx_offset_hz=50.0)
pcm = pcm.reshape(-1)

mesh = Mesh(np.asarray(jax.devices()), ("sp",))
y = rx_frontend_timeparallel(cfg, pcm, mesh)
from jax.experimental import multihost_utils
got = np.asarray(multihost_utils.process_allgather(y.re, tiled=True))
if pid == 0:
    np.save(f"/tmp/mp_front_{port}.npy", got)

# round 4: FULL demod dp-sharded across BOTH processes == the local
# single-device decode, bit-for-bit (process-spanning NamedSharding
# through the whole rx_stream, not just the front-end)
from qpsk_tpu import rx_init
from qpsk_tpu.modem import rx_stream

c, nfr = 8, 3
rng2 = np.random.default_rng(1)
pcm_c = jnp.asarray(rng2.integers(-8192, 8192, (c, nfr, cfg.frame_size),
                                  dtype=np.int16))
mesh_dp = Mesh(np.asarray(jax.devices()), ("dp",))
sh = NamedSharding(mesh_dp, P("dp"))
st = jax.device_put(rx_init(cfg, batch_shape=(c,)), sh)
xp = jax.device_put(pcm_c, sh)
_, out = jax.jit(lambda s, x: rx_stream(cfg, s, x))(st, xp)
bits_sh = np.asarray(multihost_utils.process_allgather(out.bits,
                                                       tiled=True))
_, ref = jax.jit(lambda s, x: rx_stream(cfg, s, x),
                 device=jax.local_devices()[0])(
    rx_init(cfg, batch_shape=(c,)), pcm_c)
assert np.array_equal(bits_sh, np.asarray(ref.bits)),     "cross-process dp demod differs from local decode"
print("WORKER_DEMOD_OK", pid, flush=True)
print("WORKER_OK", pid, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_frontend(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=220)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out

    # compare process-0's globally-assembled front-end to the serial chain
    got = np.load(f"/tmp/mp_front_{port}.npy")
    import jax.numpy as jnp
    from qpsk_tpu import ModemConfig, tx_init
    from qpsk_tpu.modem import _pick_block, _tmat_for, tx_stream
    from qpsk_tpu.ops import nco, rrc as rrc_ops
    from qpsk_tpu.ops.cplx import CF32
    from qpsk_tpu.packet import PacketConfig, assemble_packet

    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, (16, 240), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload),
                       tx_offset_hz=50.0)
    flat = pcm.reshape(-1)
    xr = flat.astype(jnp.float32) / jnp.float32(cfg.pcm_scale)
    x = CF32(xr, jnp.zeros_like(xr))
    x, _ = nco.mix(x, nco.nco_init(), -cfg.omega_center, "fast")
    y, _ = rrc_ops.fir_block(x, rrc_ops.fir_init_tail(cfg.ntaps),
                             jnp.asarray(_tmat_for(cfg, 512)), cfg.gain, 512)
    np.testing.assert_allclose(got, np.asarray(y.re), atol=2e-4)
