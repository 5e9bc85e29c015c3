"""Pallas TPU kernels for the modem's hot recurrences.

The only truly serial computation in the RX chain is the Costas loop; XLA's
``lax.scan`` pays per-step op-dispatch overhead (~1.7 us/step measured on
v5e), so the loop is fused into a single Mosaic kernel with channels on the
VPU lanes (ops/pallas/costas_kernel.py).  Everything else in the pipeline is
matmuls and elementwise ops that XLA already lowers well.
"""

from qpsk_tpu.ops.pallas.costas_kernel import costas_run_pallas
