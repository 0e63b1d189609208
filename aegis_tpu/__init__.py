"""aegis_tpu — TPU-native guitar audio → MIDI/tablature transcription framework.

A ground-up JAX/XLA/Pallas redesign with the capabilities of the reference
"Aegis Engine" (avabag01-ai/spectrogram-midi): spectrogram → pitch salience →
noise masks → trend filters → note events → MIDI, plus the surrounding
self-verification loops, synthesis, harmony analysis, tablature and serving
layers.

Design stance (see SURVEY.md §7):
  * The hot loop (STFT → mel → pYIN → RMS) runs as one jitted device program,
    batched over fixed-size frame tiles; long audio is sharded over a
    ``jax.sharding.Mesh`` time axis with halo overlap (``engine.turbo``).
  * Per-frame Python loops of the reference are re-expressed as ``lax.scan``
    recurrences / windowed reductions (``core.trend``), segment reductions
    (``core.masks``) and fixed-shape vectorized math (``core.pyin``).
  * A faithful NumPy implementation of every device kernel lives in
    ``aegis_tpu.ref`` and serves as the CPU oracle for parity tests.
  * Host-side: MIDI SMF codec, MusicXML, tabs, WAV I/O, servers.
"""

__version__ = "0.1.0"

from aegis_tpu.config import AudioConfig, DetectorConfig, PyinConfig  # noqa: F401


def __getattr__(name):
    # Lazy imports keep `import aegis_tpu` cheap (no jax import until needed).
    if name == "AegisEngine":
        from aegis_tpu.engine.engine import AegisEngine

        return AegisEngine
    if name == "AegisFinancialEngine":
        from aegis_tpu.engine.financial import AegisFinancialEngine

        return AegisFinancialEngine
    raise AttributeError(f"module 'aegis_tpu' has no attribute {name!r}")
