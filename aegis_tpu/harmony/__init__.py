from aegis_tpu.harmony.key import HarmonicAnalyzer, apply_harmonic_filter  # noqa: F401
