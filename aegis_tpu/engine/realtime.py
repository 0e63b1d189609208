"""Realtime (online) transcription: feed PCM chunks, poll events live.

Beyond the reference's capabilities (its closest feature is region slicing,
aegis_app.py:274-281): a stateful transcriber for LIVE input — an audio
interface, a network stream, a DAW bridge.  The design reuses the turbo tile
machinery (engine.turbo._tile_analyze — same haloed pYIN/mel/rake program,
one jit per (tile, halo) config) with two online adaptations:

  * CAUSAL dB reference: the offline pipelines reference power_to_db to the
    track-global mel peak (ref=max); a live stream can't see the future, so
    the reference is the RUNNING max, carried through the program as a
    traced scalar.  Once the loudest attack so far has passed, tiles match
    the offline turbo rows exactly (tested: a loud-first clip reproduces
    run_analyze_turbo's events at F1 = 1.0).
  * Bounded lookahead: a tile is analyzed only once its right halo has
    arrived, so the intrinsic latency is (tile + halo) frames
    (`lookahead_s`) — ~1.5 s at the default realtime config, with the
    device dispatch (~30-60 ms/tile through the tunnel) far inside the
    budget.

Host memory grows only by the per-frame output rows (~40 B/frame);
`poll_events()` re-runs the (native C++) event extraction over the
accumulated rows — the same "instant re-filter" contract as the offline
Phase 2.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import numpy as np

from aegis_tpu.config import AudioConfig, PyinConfig, TurboConfig
from aegis_tpu.core.analyze import _V1_ROWS


@functools.lru_cache(maxsize=8)
def _tile_program(audio: AudioConfig, pyin_cfg: PyinConfig,
                  turbo: TurboConfig):
    """One jitted program per config: slab + running dB ref -> packed rows
    + updated ref."""
    import jax
    import jax.numpy as jnp

    from aegis_tpu.engine.turbo import _tile_analyze, _tile_mel_power

    tile, halo = turbo.tile_frames, turbo.halo_frames

    @functools.partial(jax.jit, static_argnames=())
    def program(slab16, scale, rake_sens, ref_power):
        slab = slab16.astype(jnp.float32) * scale
        mel_power = _tile_mel_power(slab, audio, pyin_cfg, turbo)
        # causal running reference over tile INTERIORS (halo frames are
        # interior frames of neighboring tiles)
        interior_max = jnp.max(mel_power[halo: halo + tile])
        new_ref = jnp.maximum(ref_power, interior_max)
        amin = 1e-10
        mel_db = 10.0 * jnp.log10(jnp.maximum(amin, mel_power))
        mel_db = mel_db - 10.0 * jnp.log10(jnp.maximum(amin, new_ref))
        mel_db = jnp.maximum(mel_db, -80.0)
        out = _tile_analyze(slab, mel_db, rake_sens, audio, pyin_cfg, turbo)
        cols = [jnp.broadcast_to(out[k].astype(jnp.float32),
                                 (tile,))[:, None] for k in _V1_ROWS]
        return jnp.concatenate(cols, axis=1), new_ref

    return program


class StreamingTranscriber:
    """Online chunk-fed transcription (v1 pipeline).

    >>> rt = StreamingTranscriber()
    >>> for chunk in audio_source:        # arbitrary chunk sizes
    ...     rt.feed(chunk)
    ...     events = rt.poll_events()     # live event list so far
    >>> events = rt.finalize()            # flush the tail
    """

    def __init__(self, audio: Optional[AudioConfig] = None,
                 pyin_cfg: Optional[PyinConfig] = None,
                 tile_frames: int = 64, halo_frames: int = 32,
                 rake_sensitivity: float = 0.6,
                 **extract_kwargs):
        self.audio = audio or AudioConfig()
        self.pyin_cfg = pyin_cfg or PyinConfig()
        self.turbo = TurboConfig(tile_frames=tile_frames,
                                 halo_frames=halo_frames)
        self.rake_sensitivity = rake_sensitivity
        self.extract_kwargs = extract_kwargs

        hop = self.audio.hop_length
        fl = self.pyin_cfg.frame_length
        self._ctx = halo_frames * hop + fl // 2   # samples of halo context
        self._tile_samp = tile_frames * hop
        # pending raw samples; starts with ctx zeros = the offline
        # center/leading-pad convention for the first tile's left halo
        self._pending = np.zeros(self._ctx, np.float32)
        self._rows: List[np.ndarray] = []         # per-tile (tile, 6) rows
        self._ref_power = 0.0
        self._n_fed = 0

    # ------------------------------------------------------------------ props

    @property
    def lookahead_s(self) -> float:
        """Intrinsic latency: a tile is analyzed once its right halo exists."""
        return (self._tile_samp + self._ctx) / float(self.audio.sample_rate)

    @property
    def frames_analyzed(self) -> int:
        return len(self._rows) * self.turbo.tile_frames

    # ------------------------------------------------------------------ feed

    def feed(self, chunk: np.ndarray) -> int:
        """Append PCM samples; analyzes every tile whose halo is complete.
        Returns the number of tiles analyzed by this call."""
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        self._pending = np.concatenate([self._pending, chunk])
        self._n_fed += len(chunk)
        span = self._ctx + self._tile_samp + self._ctx  # left+tile+right
        done = 0
        while len(self._pending) >= span:
            self._run_tile(self._pending[:span])
            # keep the tail from the tile start onward (next tile's left
            # halo is this tile's tail)
            self._pending = self._pending[self._tile_samp:]
            done += 1
        return done

    def _run_tile(self, slab: np.ndarray) -> None:
        import jax.numpy as jnp

        from aegis_tpu.core.analyze import quantize_pcm16

        program = _tile_program(self.audio, self.pyin_cfg, self.turbo)
        slab16, scale = quantize_pcm16(slab)
        rows, new_ref = program(jnp.asarray(slab16), jnp.float32(scale),
                                jnp.float32(self.rake_sensitivity),
                                jnp.float32(self._ref_power))
        self._rows.append(np.asarray(rows))
        self._ref_power = float(new_ref)

    # ------------------------------------------------------------------ read

    def _stacked(self, n_frames: Optional[int] = None) -> Dict[str, np.ndarray]:
        if not self._rows:
            empty = np.zeros(0)
            return {k: (empty > 0 if k == "voiced_flag" else empty)
                    for k in _V1_ROWS}
        buf = np.concatenate(self._rows, axis=0)
        if n_frames is not None:
            buf = buf[:n_frames]
        return {
            "f0": buf[:, 0].astype(np.float64),
            "voiced_flag": buf[:, 1] > 0.5,
            "voiced_probs": buf[:, 2].astype(np.float64),
            "rms": buf[:, 3].astype(np.float64),
            "rake_mask": buf[:, 4] > 0.5,
            "onset_env": buf[:, 5].astype(np.float64),
        }

    def poll_events(self) -> List[dict]:
        """Events over everything analyzed so far (the live view — same
        instant re-filter contract as the offline Phase 2)."""
        from aegis_tpu.core.events import extract_events_v1

        rows = self._stacked()
        if len(rows["f0"]) == 0:
            return []
        return extract_events_v1(
            rake_mask=rows["rake_mask"], f0=np.nan_to_num(rows["f0"]),
            voiced_flag=rows["voiced_flag"], active_probs=rows["voiced_probs"],
            rms=rows["rms"], sr=self.audio.sample_rate,
            hop_length=self.audio.hop_length, **self.extract_kwargs)

    def finalize(self) -> List[dict]:
        """Flush the buffered tail (padding it with silence, the offline
        trailing-pad convention) and return the final event list."""
        true_frames = self.audio.n_frames(self._n_fed)
        remaining = true_frames - self.frames_analyzed
        if remaining > 0:
            need_tiles = -(-remaining // self.turbo.tile_frames)
            span = self._ctx + self._tile_samp + self._ctx
            pad = need_tiles * self._tile_samp + 2 * self._ctx
            self.feed(np.zeros(pad, np.float32))
            self._n_fed -= pad  # padding is not audio
        from aegis_tpu.core.events import extract_events_v1

        rows = self._stacked(true_frames)
        if len(rows["f0"]) == 0:
            return []
        return extract_events_v1(
            rake_mask=rows["rake_mask"], f0=np.nan_to_num(rows["f0"]),
            voiced_flag=rows["voiced_flag"], active_probs=rows["voiced_probs"],
            rms=rows["rms"], sr=self.audio.sample_rate,
            hop_length=self.audio.hop_length, **self.extract_kwargs)
