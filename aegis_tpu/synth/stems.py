"""Source-separation (stem) wrapper.

The reference shells out to the Demucs CLI and falls back to the original mix
when it is unavailable (aegis_engine_core/stems.py:12-29, with a hardcoded
user path we do not replicate).  Demucs is discovered on PATH or via
$AEGIS_DEMUCS_BIN; retraining/porting the model is out of scope (SURVEY.md
§2.7).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional

from aegis_tpu.utils.logging import get_logger

log = get_logger("Stems")

DEMUCS_MODELS = ("htdemucs", "htdemucs_ft", "mdx_extra")


def find_demucs() -> Optional[str]:
    env = os.environ.get("AEGIS_DEMUCS_BIN")
    if env and os.path.exists(env):
        return env
    return shutil.which("demucs")


def separate_stems(input_wav: str, output_dir: str,
                   model: str = "htdemucs", timeout: float = 600.0) -> str:
    """Run Demucs 4-stem separation; return the 'other' stem (guitar/synth)
    or the original input if Demucs is unavailable or fails."""
    binary = find_demucs()
    if binary is None:
        log.warning("demucs not found; using original mix")
        return input_wav
    try:
        subprocess.run(
            [binary, "-n", model, "-o", output_dir, input_wav],
            check=True, capture_output=True, timeout=timeout,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        log.warning(f"demucs failed ({e}); using original mix")
        return input_wav
    base = os.path.splitext(os.path.basename(input_wav))[0]
    other = os.path.join(output_dir, model, base, "other.wav")
    if os.path.exists(other):
        return other
    log.warning("demucs produced no 'other' stem; using original mix")
    return input_wav


def separate_all_stems(input_wav: str, output_dir: str,
                       model: str = "htdemucs") -> List[str]:
    """All four stems (drums/bass/other/vocals) or [] when unavailable."""
    binary = find_demucs()
    if binary is None:
        return []
    try:
        subprocess.run([binary, "-n", model, "-o", output_dir, input_wav],
                       check=True, capture_output=True, timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return []
    base = os.path.splitext(os.path.basename(input_wav))[0]
    stem_dir = os.path.join(output_dir, model, base)
    return [
        os.path.join(stem_dir, f)
        for f in ("drums.wav", "bass.wav", "other.wav", "vocals.wav")
        if os.path.exists(os.path.join(stem_dir, f))
    ]
