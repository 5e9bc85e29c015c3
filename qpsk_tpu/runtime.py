"""Streaming runtime: push-mode demodulation with automatic sync.

The batch API (``rx_stream`` + ``find_sync`` + ``extract_packets_tracked``)
asks the caller to manage state, alignment, and packet framing.  This
module wraps it all into the receiver object a deployment actually wants:

    demod = StreamDemodulator(ModemConfig(), PacketConfig(payload_bytes=30))
    for chunk in audio_source:          # int16 PCM, any chunk size
        for pkt in demod.push(chunk):   # bit-exact payloads as they decode
            handle(pkt.payload)

Behavior:

* arbitrary chunk sizes — samples are buffered to whole frames (the
  native ring buffer in qpsk_tpu.io serves the real-time capture side);
  ``push`` is eager (buffers and demodulates even if the returned packet
  list is discarded);
* FFT acquisition warm-starts the Costas loop on the first frames (when
  ``cfg.acquisition == "fft"``; parity mode cold-starts like the C loop);
* packet sync (rotation + alignment) happens automatically once enough
  post-transient bits accumulate — a sliding hunt across the bit stream —
  and is CRC-tracked thereafter (cycle slips cost one packet, not the
  stream); each drained span disassembles all four rotation hypotheses in
  ONE batched device pass;
* with ``pcfg.fec`` the receiver buffers LLRs alongside the hard bits and
  drains packets through soft-decision Viterbi (~2 dB over hard-input
  decoding) — hard bits still drive the CRC-scored sync hunt;
* ``flush()`` drains remaining whole packets; counters expose link metrics
  (frames, packets, CRC failures, detected offset);
* signal gaps: if CRC failures persist for ``resync_after`` consecutive
  packets the receiver drops sync and re-acquires — the failure-detect/
  re-arm behavior the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qpsk_tpu.config import ModemConfig
from qpsk_tpu.modem import rx_acquire_hz, rx_stream
from qpsk_tpu.ops.acquire import hz_to_costas_freq
from qpsk_tpu.ops.cplx import CF32
from qpsk_tpu.ops.modmap import demod_soft
from qpsk_tpu.packet.frame import (PacketConfig, disassemble_packet,
                                   disassemble_packet_soft)
from qpsk_tpu.state import rx_init
from qpsk_tpu.sync import (SyncResult, default_max_lag, find_sync,
                           rotate_dibits, rotate_soft)


class Packet(NamedTuple):
    payload: np.ndarray   # (8*payload_bytes,) bits
    crc_ok: bool
    stream_index: int     # packet index within the current sync epoch


@dataclasses.dataclass
class LinkCounters:
    frames: int = 0
    packets: int = 0
    crc_failures: int = 0
    resyncs: int = 0
    detected_offset_hz: float = 0.0
    synced: bool = False


class StreamDemodulator:
    """Push-mode QPSK packet receiver (see module docstring)."""

    def __init__(self, cfg: ModemConfig, pcfg: PacketConfig,
                 sync_skip_frames: int = 8, probe_frames: int = 4,
                 resync_after: int = 8, bucket_frames: int = 8):
        self.cfg = cfg
        self.pcfg = pcfg
        self.sync_skip = sync_skip_frames * pcfg.frame_bits
        self.probe_frames = probe_frames
        self.resync_after = resync_after
        self.bucket_frames = bucket_frames
        self.counters = LinkCounters()
        # Exactly TWO static rx_stream shapes ever compile, regardless of
        # the chunk sizes pushed: (bucket_frames, frame) for steady-state
        # draining and (1, frame) for the flush() remainder.  On the real
        # TPU backend every new shape costs a 1-4 minute remote compile
        # (CLAUDE.md), so jitting on whatever nframes arrives would make
        # arbitrary-chunk push streams unusable.
        self._rx_jit = jax.jit(functools.partial(rx_stream, cfg))

        self._pcm_buf = np.zeros(0, np.int16)
        self._bit_buf = np.zeros(0, np.int32)
        # with FEC, a parallel LLR buffer (elementwise aligned with the bit
        # buffer) feeds soft-decision Viterbi — ~2 dB over hard-input.
        # Differential bits come from the turn-difference decode, so
        # per-bit LLRs of the absolute symbols don't apply there: FEC
        # falls back to hard-input Viterbi inside disassemble_packet.
        self._use_soft = pcfg.fec and not cfg.differential
        self._llr_buf = np.zeros(0, np.float32)
        self._state = None
        self._sync: SyncResult | None = None
        self._rotation = 0
        self._consecutive_bad = 0
        self._pkt_index = 0

    # ------------------------------------------------------------------
    def push(self, pcm: np.ndarray) -> list[Packet]:
        """Feed int16 PCM of any length; returns packets decoded so far.
        Eager: buffering and demodulation happen even if the returned list
        is ignored.  Frames demodulate in fixed ``bucket_frames`` buckets
        (one static jit shape); a sub-bucket remainder stays buffered until
        more samples arrive or ``flush()``."""
        pcm = np.asarray(pcm, np.int16).ravel()
        self._pcm_buf = np.concatenate([self._pcm_buf, pcm])
        fsz = self.cfg.frame_size
        bucket = self.bucket_frames * fsz
        while self._pcm_buf.size >= bucket:
            self._demod(self._pcm_buf[:bucket].reshape(self.bucket_frames,
                                                       fsz))
            self._pcm_buf = self._pcm_buf[bucket:]
        return self._drain()

    def _demod(self, chunk: np.ndarray) -> None:
        """Run one fixed-shape rx_stream pass and buffer its bits/LLRs."""
        nframes = chunk.shape[0]
        if self._state is None:
            acq = 0.0
            if self.cfg.acquisition == "fft":
                try:
                    est = rx_acquire_hz(self.cfg, jnp.asarray(chunk))
                    acq = hz_to_costas_freq(est, self.cfg.rs)
                except ValueError:
                    pass  # chunk too short: cold-start, acquire later
            self._state = rx_init(self.cfg, acq_freq=acq)

        self._state, out = self._rx_jit(self._state, jnp.asarray(chunk))
        self.counters.frames += nframes
        self.counters.detected_offset_hz = float(np.mean(
            np.asarray(out.freq_hz)[-min(10, nframes):]))
        self._bit_buf = np.concatenate(
            [self._bit_buf, np.asarray(out.bits).ravel()])
        if self._use_soft:
            llrs = demod_soft(CF32(out.symbols.re.reshape(-1),
                                   out.symbols.im.reshape(-1)))
            self._llr_buf = np.concatenate(
                [self._llr_buf, np.asarray(llrs).ravel()])

    # ------------------------------------------------------------------
    def _try_sync(self) -> bool:
        fb = self.pcfg.frame_bits
        window = default_max_lag(self.pcfg)
        probe_bits = self.probe_frames * fb + 64
        while True:
            if self._bit_buf.size - self.sync_skip < probe_bits:
                return False
            stream = jnp.asarray(self._bit_buf[self.sync_skip:])
            sync = find_sync(self.pcfg, stream, max_lag=window,
                             probe_frames=self.probe_frames)
            if int(sync.score) >= max(2, self.probe_frames - 1):
                # consume everything before the first aligned packet
                cut = self.sync_skip + int(sync.bit_lag)
                self._bit_buf = self._bit_buf[cut:]
                if self._use_soft:
                    self._llr_buf = self._llr_buf[cut:]
                self._sync = sync
                self._rotation = int(sync.rotation)
                self.counters.synced = True
                self.sync_skip = 0  # future resyncs hunt from the head
                self._pkt_index = 0  # stream_index restarts per sync epoch
                return True
            # no sync in [sync_skip, sync_skip + window): those bits are
            # dead — slide the hunt forward if more stream remains, and
            # trim the dead prefix so the buffer stays bounded
            if self._bit_buf.size - self.sync_skip > probe_bits + window:
                cut = self.sync_skip + window
                self._bit_buf = self._bit_buf[cut:]
                if self._use_soft:
                    self._llr_buf = self._llr_buf[cut:]
                self.sync_skip = 0
                continue
            return False

    def _drain(self) -> list[Packet]:
        fb = self.pcfg.frame_bits
        out: list[Packet] = []
        while True:
            if self._sync is None and not self._try_sync():
                return out
            nf = self._bit_buf.size // fb
            if nf == 0:
                return out
            frames = jnp.asarray(
                self._bit_buf[:nf * fb]).reshape(nf, fb)
            self._bit_buf = self._bit_buf[nf * fb:]
            # one batched pass over all frames x all 4 rotations
            if self._use_soft:
                soft = jnp.asarray(
                    self._llr_buf[:nf * fb]).reshape(nf, fb)
                self._llr_buf = self._llr_buf[nf * fb:]
                cand = jnp.stack([rotate_soft(soft, r) for r in range(4)])
                rx = disassemble_packet_soft(self.pcfg, cand)
            else:
                cand = jnp.stack([rotate_dibits(frames, r)
                                  for r in range(4)])
                rx = disassemble_packet(self.pcfg, cand)
            ok = np.asarray(rx.crc_ok)               # (4, nf)
            payloads = np.asarray(rx.payload_bits)   # (4, nf, bits)
            resync = False
            for j in range(nf):
                passing = np.flatnonzero(ok[:, j])
                if passing.size:
                    r = (self._rotation if ok[self._rotation, j]
                         else int(passing[0]))
                    self._rotation = r
                    self._consecutive_bad = 0
                    good = True
                else:
                    r = self._rotation
                    self.counters.crc_failures += 1
                    self._consecutive_bad += 1
                    good = False
                out.append(Packet(payloads[r, j], good, self._pkt_index))
                self._pkt_index += 1
                self.counters.packets += 1
                if self._consecutive_bad >= self.resync_after:
                    # lost the channel: drop sync and re-arm (SURVEY.md §5)
                    self._sync = None
                    self.counters.synced = False
                    self.counters.resyncs += 1
                    self._consecutive_bad = 0
                    # return unconsumed frames to the buffer and re-hunt
                    rest = np.asarray(frames[j + 1:]).reshape(-1)
                    self._bit_buf = np.concatenate(
                        [rest.astype(np.int32), self._bit_buf])
                    if self._use_soft:
                        rest_s = np.asarray(soft[j + 1:]).reshape(-1)
                        self._llr_buf = np.concatenate(
                            [rest_s.astype(np.float32), self._llr_buf])
                    resync = True
                    break
            if not resync:
                return out

    def flush(self) -> list[Packet]:
        """Demodulate any buffered whole frames (the sub-bucket remainder,
        one frame per pass — the second and last static shape), then decode
        whatever whole packets remain."""
        fsz = self.cfg.frame_size
        while self._pcm_buf.size >= fsz:
            self._demod(self._pcm_buf[:fsz].reshape(1, fsz))
            self._pcm_buf = self._pcm_buf[fsz:]
        return self._drain()
