from qpsk_tpu.utils.checkpoint import load_state, save_state
