"""Bundle /tmp/golden raw dumps into tests/golden/reference_vectors.npz."""
import numpy as np

g = "/tmp/golden/"
np.savez_compressed(
    "tests/golden/reference_vectors.npz",
    impulse=np.fromfile(g + "impulse.f32", np.float32).reshape(-1, 2),
    bits=np.fromfile(g + "bits.i32", np.int32).reshape(20, 512),
    pcm=np.fromfile(g + "pcm.i16", np.int16).reshape(20, 1024),
    filt=np.fromfile(g + "filt.f32", np.float32).reshape(40, 512, 2),
    decim=np.fromfile(g + "decim.f32", np.float32).reshape(40, 128, 2),
    costas=np.fromfile(g + "costas.f32", np.float32).reshape(40, 128, 2),
    freq=np.fromfile(g + "freq.f32", np.float32).reshape(40, 2),
)
