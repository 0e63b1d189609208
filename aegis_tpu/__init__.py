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

import os as _os

# Persistent XLA compilation cache: the fused analyze program takes minutes to
# compile on a cold backend (remote-compile tunnels especially), milliseconds
# to load from cache.  Opt-out via AEGIS_NO_COMPILE_CACHE=1.  Env vars are set
# here (before any jax import — the package imports jax lazily) so every
# entry point (engines, serve, apps, bench) benefits, not just the test suite.
if not _os.environ.get("AEGIS_NO_COMPILE_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "aegis_tpu", "xla"),
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

    # If something (e.g. a sitecustomize) already imported jax, the env vars
    # above were read too late — apply the same settings through jax.config.
    import sys as _sys

    if "jax" in _sys.modules:
        try:
            _jax = _sys.modules["jax"]
            if _jax.config.jax_compilation_cache_dir is None:
                _jax.config.update(
                    "jax_compilation_cache_dir",
                    _os.environ["JAX_COMPILATION_CACHE_DIR"],
                )
                _jax.config.update(
                    "jax_persistent_cache_min_entry_size_bytes", 0)
                _jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # cache is an optimization; never block import
            pass

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
