"""Stem Lab — standalone Demucs runner UI with model choice and 4-stem
playback/download (reference stem_lab_app.py)."""

from __future__ import annotations

import os
import tempfile

from aegis_tpu.apps.common import audio_player, require_streamlit
from aegis_tpu.synth.stems import (DEMUCS_MODELS, find_demucs, separate_hpss,
                                   separate_all_stems)


def main() -> None:
    st = require_streamlit()
    st.set_page_config(page_title="Stem Lab", layout="centered")
    st.title("🥁 Stem Lab")

    have_demucs = find_demucs() is not None
    if not have_demucs:
        st.info("Demucs binary not found (PATH / $AEGIS_DEMUCS_BIN); "
                "the on-device HPSS separator is available instead.")

    choices = (list(DEMUCS_MODELS) if have_demucs else []) + ["hpss (on-device)"]
    model = st.selectbox("Model", choices)
    upload = st.file_uploader("Audio", type=["wav", "mp3", "flac"])
    if upload is None or st.button("Separate") is False:
        return

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        f.write(upload.getvalue())
    with st.status("Separating…"):
        if model.startswith("hpss"):
            harm = separate_hpss(f.name, tempfile.mkdtemp())
            stem_dir = os.path.dirname(harm)
            stems = [os.path.join(stem_dir, n)
                     for n in ("other.wav", "drums.wav")]
        else:
            stems = separate_all_stems(f.name, tempfile.mkdtemp(), model=model)
    os.unlink(f.name)
    if not stems:
        st.error("Separation failed.")
        return
    for path in stems:
        name = os.path.basename(path)
        with open(path, "rb") as sf_:
            data = sf_.read()
        audio_player(st, data, name)
        st.download_button(f"⬇ {name}", data, name, "audio/wav")


if __name__ == "__main__":
    main()
