"""AegisEngine — the v1 two-phase engine facade.

API surface mirrors the reference engine (aegis_engine.py:16-216):

  * ``audio_to_midi(input_wav, output_mid=None, **kw) -> raw_data`` — the
    heavy, cacheable "Perception Phase".  Here it is ONE fused device program
    (core.analyze) instead of four librosa passes; Turbo mode is sharded
    device tiling (engine.turbo) instead of a process pool.
  * ``extract_events(raw_data, output_mid, **kw) -> events`` — the fast
    "Logic Filter Layer" that re-runs on every slider move.
  * ``load_audio``, ``separate_stems``, ``generate_tabs``, ``export_musicxml``,
    ``detect_rake_patterns`` helpers.

raw_data dict schema (reference aegis_engine.py:72-75) is preserved:
  {rake_mask, f0, voiced_flag, voiced_probs, rms, y} (+ mel_db extra).
f0 is zero-filled on unvoiced frames, matching the reference's
``np.nan_to_num`` contract (aegis_engine.py:69).

Failure ladder (SURVEY.md §5.3): device program -> NumPy oracle fallback.
Checkpoint/resume (SURVEY.md §5.4): ``save_raw`` / ``load_raw`` persist
raw_data as .npz so sessions survive restarts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

from aegis_tpu.config import AudioConfig, PyinConfig
from aegis_tpu.core.events import extract_events_v1
from aegis_tpu.io.audio import load_audio as _load_audio
from aegis_tpu.midi.encode import events_to_midi
from aegis_tpu.utils.logging import get_logger

log = get_logger("Aegis")


def normalize_turbo_mode(mode, n_samples: int, sample_rate: int,
                         stream_threshold_s: float = 240.0,
                         allow_stream: bool = True):
    """One canonical turbo vocabulary for the facades AND the HTTP layer.

    Returns False (fused single program), "tiles" (sharded tiling) or
    "stream" (bounded-memory slabs):
      False | None | "" | "off"  -> False
      True | "tiles" | "turbo"   -> "tiles"
      "stream"                   -> "stream" (or "tiles" if not available)
      "auto"                     -> "stream" past stream_threshold_s,
                                    else False
    Unknown strings raise ValueError — a silent truthy-string fallthrough
    used to route turbo_mode="off" to the TILED path."""
    if mode in (False, None, "", "off"):
        return False
    if mode in (True, "tiles", "turbo"):
        return "tiles"
    if mode == "stream":
        return "stream" if allow_stream else "tiles"
    if mode == "auto":
        if n_samples / sample_rate > stream_threshold_s:
            return "stream" if allow_stream else "tiles"
        return False
    raise ValueError(f"unknown turbo mode: {mode!r}")


class AegisEngine:
    def __init__(self, sample_rate: int = 44100, hop_length: int = 512,
                 n_fft: int = 2048, backend: str = "auto"):
        """backend: 'auto' (device with oracle fallback), 'device', or 'ref'
        (NumPy oracle only)."""
        self.audio = AudioConfig(sample_rate=sample_rate, hop_length=hop_length,
                                 n_fft=n_fft)
        self.pyin_cfg = PyinConfig()
        self.backend = backend

    # ------------------------------------------------------------------ audio

    @property
    def sr(self) -> int:
        return self.audio.sample_rate

    @property
    def hop_length(self) -> int:
        return self.audio.hop_length

    def load_audio(self, file_path: Union[str, bytes], start_time: float = 0,
                   end_time: Optional[float] = None):
        """Returns (y, S_dB) with S_dB in librosa layout (n_mels, T)."""
        duration = (end_time - start_time) if end_time else None
        y, _ = _load_audio(file_path, sr=self.sr, offset=start_time,
                           duration=duration)
        from aegis_tpu.ref.dsp_ref import melspectrogram, power_to_db

        S_dB = power_to_db(melspectrogram(y, self.sr, self.audio.n_fft,
                                          self.hop_length, self.audio.n_mels))
        return y, S_dB

    # -------------------------------------------------------------- phase one

    def _neural_params(self):
        """PitchNet weights (process-wide cache, device-resident)."""
        from aegis_tpu.models.pitchnet import default_params_device

        return default_params_device()

    def _analyze(self, y: np.ndarray, rake_sensitivity: float,
                 turbo, fetch_mel: bool = True,
                 turbo_config=None, pitch_backend: str = "pyin"
                 ) -> Dict[str, np.ndarray]:
        """turbo: False = fused single program, True = sharded tiles,
        "stream" = bounded-memory slab streaming (multi-minute tracks).
        pitch_backend: "pyin" (default, the F1-gated parity path) or
        "neural" (PitchNet — fused mel/rake/RMS + learned f0, no Viterbi;
        see models/pitchnet.py).  The neural path supports fused and
        "stream" (bounded-memory slabs, bit-identical rows); sharded
        "tiles" applies to pYIN only."""
        if pitch_backend == "neural":
            from aegis_tpu.models.pitchnet import run_analyze_neural, \
                run_analyze_neural_streamed

            if turbo == "stream":
                if (self.hop_length * 22050) % self.sr == 0:
                    return run_analyze_neural_streamed(
                        y, self.sr, self.hop_length, self._neural_params(),
                        rake_sensitivity, n_fft=self.audio.n_fft,
                        n_mels=self.audio.n_mels, fetch_mel=fetch_mel)
                # exotic rate (no integral 22.05 kHz hop): the streamed
                # slabs can't frame it uniformly — fall back to the fused
                # dual-rate centers-gather path instead of crashing
                log.warning(
                    f"neural streamed mode needs an integral 22.05 kHz "
                    f"hop (sr={self.sr}); running the fused program")
                turbo = False
            if turbo:
                log.warning(
                    f"neural backend has no sharded-tiles mode; "
                    f"turbo={turbo!r} runs the fused single program "
                    f"(turbo_mode='stream' for bounded memory)")
            return run_analyze_neural(y, self.sr, self.hop_length,
                                      self._neural_params(),
                                      rake_sensitivity,
                                      n_fft=self.audio.n_fft,
                                      n_mels=self.audio.n_mels,
                                      fetch_mel=fetch_mel)
        if pitch_backend != "pyin":
            raise ValueError(f"unknown pitch backend: {pitch_backend!r}")
        if self.backend != "ref":
            try:
                if turbo == "stream":
                    from aegis_tpu.engine.turbo import run_analyze_streamed

                    return run_analyze_streamed(y, self.audio, self.pyin_cfg,
                                                rake_sensitivity,
                                                turbo=turbo_config,
                                                fetch_mel=fetch_mel)
                if turbo:
                    from aegis_tpu.engine.turbo import run_analyze_turbo

                    return run_analyze_turbo(y, self.audio, self.pyin_cfg,
                                             rake_sensitivity,
                                             turbo=turbo_config,
                                             fetch_mel=fetch_mel)
                from aegis_tpu.core.analyze import run_analyze

                return run_analyze(y, self.audio, self.pyin_cfg,
                                   rake_sensitivity, fetch_mel=fetch_mel)
            except Exception as e:  # graceful degradation, SURVEY.md §5.3
                if self.backend == "device":
                    raise
                log.warning(f"device analyze failed ({e}); NumPy oracle fallback")
        from aegis_tpu.ref.pipeline_ref import run_analyze_ref

        return run_analyze_ref(y, self.audio, self.pyin_cfg, rake_sensitivity)

    def audio_to_midi(self, input_wav: Union[str, bytes, np.ndarray],
                      output_mid=None, **kwargs) -> Optional[Dict]:
        """Perception Phase (analyze once): returns the cacheable raw_data."""
        start_time = kwargs.get("start_time", 0)
        end_time = kwargs.get("end_time", None)
        rake_sensitivity = kwargs.get("rake_sensitivity", 0.6)

        if isinstance(input_wav, np.ndarray):
            y = input_wav.astype(np.float32)
        else:
            duration = (end_time - start_time) if end_time else None
            y, _ = _load_audio(input_wav, sr=self.sr, offset=start_time,
                               duration=duration)
        if len(y) == 0:
            return None
        turbo_mode = normalize_turbo_mode(
            kwargs.get("turbo_mode", False), len(y), self.sr,
            kwargs.get("stream_threshold_s", 240.0))

        log.info(f"Perception Phase (turbo={turbo_mode}, {len(y)/self.sr:.1f}s)")
        from aegis_tpu.utils.prof import phase

        with phase("aegis.perception", quiet=True):
            out = self._analyze(y, rake_sensitivity, turbo_mode,
                                kwargs.get("fetch_mel", True),
                                kwargs.get("turbo_config", None),
                                kwargs.get("pitch_backend", "pyin"))

        raw = {
            "rake_mask": np.asarray(out["rake_mask"]),
            "f0": np.nan_to_num(np.asarray(out["f0"], dtype=np.float64)),
            "voiced_flag": np.asarray(out["voiced_flag"]),
            "voiced_probs": np.asarray(out["voiced_probs"], dtype=np.float64),
            "rms": np.asarray(out["rms"], dtype=np.float64),
            "y": y,
        }
        if "onset_env" in out:
            raw["onset_env"] = np.asarray(out["onset_env"], dtype=np.float64)
        if "mel_db" in out:
            raw["mel_db"] = np.asarray(out["mel_db"])
        # marker for backend-conditional extraction (the neural backend's
        # forward onset snap); np.savez round-trips it as a 0-d str array
        raw["pitch_backend"] = kwargs.get("pitch_backend", "pyin")
        if output_mid is not None:
            self.extract_events(raw, output_mid, **kwargs)
        return raw

    # -------------------------------------------------------------- phase two

    def extract_events(self, raw_data: Dict, output_mid=None, **kwargs) -> List[dict]:
        """Logic Filter Layer: fast re-runnable event extraction + MIDI encode."""
        from aegis_tpu.utils.prof import phase as _phase

        with _phase("aegis.extract", quiet=True):
            return self._extract_events(raw_data, output_mid, **kwargs)

    def _extract_events(self, raw_data: Dict, output_mid=None,
                        **kwargs) -> List[dict]:
        events = extract_events_v1(
            rake_mask=raw_data["rake_mask"],
            f0=raw_data["f0"],
            voiced_flag=raw_data["voiced_flag"],
            active_probs=raw_data["voiced_probs"],
            rms=raw_data["rms"],
            sr=self.sr,
            hop_length=self.hop_length,
            confidence_threshold=kwargs.get("confidence_threshold", 0.70),
            noise_gate_db=kwargs.get("noise_gate_db", -40),
            sustain_ms=kwargs.get("sustain_ms", 50),
            min_note_duration_ms=kwargs.get("min_note_duration_ms", 50),
            # onset refinement (re-attack splitting + attack-time snap) is
            # the library default, matching the serve layer; use_onsets=False
            # restores the reference's exact merge/lag semantics
            onset_env=raw_data.get("onset_env")
            if kwargs.get("use_onsets", True) else None,
            # PitchNet fires up to ~a window early (phase-blind magnitude
            # features); the forward snap moves such starts to the attack
            # rise.  pYIN never fires early, so it stays off there.
            onset_fwd_snap_ms=kwargs.get(
                "onset_fwd_snap_ms",
                100.0 if str(raw_data.get("pitch_backend", "")) == "neural"
                else 0.0),
        )
        if output_mid is not None:
            bpm = kwargs.get("bpm")
            if bpm == "auto":
                bpm = self.estimate_bpm(raw_data)
            events_to_midi(
                events,
                self.sr,
                self.hop_length,
                midi_program=kwargs.get("midi_program", 27),
                vibrato_rate=kwargs.get("vibrato_rate", 5.0),
                vibrato_depth=kwargs.get("vibrato_depth", 0.3),
                bpm=bpm,
                output=output_mid,
            )
        return events

    def estimate_bpm(self, raw_data: Dict):
        """Tempo estimate from the analysis onset envelope (None when the
        track carries no periodicity).  Beyond-reference: the reference
        always encodes MIDI at an implicit 120 BPM."""
        from aegis_tpu.core.tempo import estimate_bpm

        return estimate_bpm(raw_data, self.sr, self.hop_length)

    # ------------------------------------------------------------ persistence

    @staticmethod
    def save_raw(raw_data: Dict, path: str) -> None:
        np.savez_compressed(path, **raw_data)

    @staticmethod
    def load_raw(path: str) -> Dict:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    # --------------------------------------------------------------- helpers

    def detect_rake_patterns(self, S_dB: np.ndarray,
                             rake_sensitivity: float = 0.6) -> np.ndarray:
        """S_dB in (n_mels, T) librosa layout (host helper)."""
        from aegis_tpu.ref.masks_ref import detect_rake

        return detect_rake(S_dB.T, self.hop_length, self.sr, rake_sensitivity)

    def separate_stems(self, input_wav: str, output_dir: str) -> str:
        from aegis_tpu.synth.stems import separate_stems

        return separate_stems(input_wav, output_dir)

    def generate_tabs(self, events: List[dict]) -> List[dict]:
        from aegis_tpu.midi.tabs import generate_tabs

        return generate_tabs(events)

    def export_musicxml(self, tab_data: List[dict], xml_path: str) -> str:
        from aegis_tpu.midi.musicxml import export_musicxml

        return export_musicxml(tab_data, xml_path)
