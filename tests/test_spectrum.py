"""TX spectral mask: the on-air signal the modem actually emits.

The reference checks its TX chain only by eyeballing a scatter plot after
loopback; nothing ever verifies the transmitted spectrum.  For an
audio-band radio modem the spectrum IS the product spec: occupied
bandwidth rs*(1+alpha) centered on the carrier (qpsk.h:16-18, rrc_fir.c
design), and out-of-band rejection set by the 127-tap RRC.  These tests
pin both for the 2400- and 1200-baud modes.
"""

import jax.numpy as jnp
import numpy as np

from qpsk_tpu import ModemConfig, tx_init
from qpsk_tpu.modem import tx_stream
from qpsk_tpu.packet import PacketConfig, assemble_packet


def _tx_psd(cfg, nframes=100, nfft=1024):
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, (nframes, 240), dtype=np.int32))
    _, pcm = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload))
    x = np.asarray(pcm).reshape(-1).astype(np.float64)
    w = np.hanning(nfft)
    segs = [x[i:i + nfft] * w for i in range(0, len(x) - nfft, nfft // 2)]
    psd = np.mean([np.abs(np.fft.rfft(s)) ** 2 for s in segs], axis=0)
    return np.fft.rfftfreq(nfft, 1 / cfg.fs), psd


def _check_mask(cfg, min_stop_rej_db):
    f, s = _tx_psd(cfg)
    bw = cfg.rs * (1 + cfg.alpha) / 2
    inband = (f >= cfg.center - bw - 50) & (f <= cfg.center + bw + 50)

    # essentially all power inside the RRC-designed occupied bandwidth
    assert s[inband].sum() / s.sum() > 0.999

    # out-of-band rejection past the roll-off edge (measured ~-70 dB at
    # 2400 baud, ~-62 dB at 1200 baud — assert with margin)
    stop = f >= cfg.center + bw + 300
    rej_db = 10 * np.log10(s[stop].mean() / s[inband].mean())
    assert rej_db < -min_stop_rej_db, rej_db

    # the -3 dB width of an RRC-shaped PSD is ~ the symbol rate, centered
    # on the carrier
    half = f[s > s.max() / 2]
    width = half[-1] - half[0]
    assert 0.85 * cfg.rs < width < 1.1 * cfg.rs, width
    assert abs((half[0] + half[-1]) / 2 - cfg.center) < 60.0


def test_tx_spectrum_2400():
    _check_mask(ModemConfig(), min_stop_rej_db=55)


def test_tx_spectrum_1200():
    _check_mask(ModemConfig(rs=1200.0), min_stop_rej_db=50)


def test_tx_offset_moves_the_carrier():
    """The +50 Hz stimulus (qpsk.c:320) must move the whole emission."""
    cfg = ModemConfig()
    pcfg = PacketConfig(payload_bytes=30)
    rng = np.random.default_rng(1)
    payload = jnp.asarray(rng.integers(0, 2, (60, 240), dtype=np.int32))
    _, p0 = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload))
    _, p1 = tx_stream(cfg, tx_init(cfg), assemble_packet(pcfg, payload),
                      tx_offset_hz=200.0)

    def centroid(pcm):
        x = np.asarray(pcm).reshape(-1).astype(np.float64)
        nfft = 4096
        w = np.hanning(nfft)
        segs = [x[i:i + nfft] * w
                for i in range(0, len(x) - nfft, nfft // 2)]
        s = np.mean([np.abs(np.fft.rfft(g)) ** 2 for g in segs], axis=0)
        f = np.fft.rfftfreq(nfft, 1 / cfg.fs)
        return float((f * s).sum() / s.sum())

    d = centroid(p1) - centroid(p0)
    assert abs(d - 200.0) < 10.0, d
