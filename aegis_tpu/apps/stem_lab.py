"""Stem Lab — standalone Demucs runner UI with model choice and 4-stem
playback/download (reference stem_lab_app.py)."""

from __future__ import annotations

import os
import tempfile

from aegis_tpu.apps.common import audio_player, require_streamlit
from aegis_tpu.synth.stems import DEMUCS_MODELS, find_demucs, separate_all_stems


def main() -> None:
    st = require_streamlit()
    st.set_page_config(page_title="Stem Lab", layout="centered")
    st.title("🥁 Stem Lab")

    if find_demucs() is None:
        st.warning("Demucs binary not found (PATH / $AEGIS_DEMUCS_BIN). "
                   "Separation unavailable; the engine will use the full mix.")

    model = st.selectbox("Model", list(DEMUCS_MODELS))
    upload = st.file_uploader("Audio", type=["wav", "mp3", "flac"])
    if upload is None or st.button("Separate") is False:
        return

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        f.write(upload.getvalue())
    with st.status("Separating…"):
        stems = separate_all_stems(f.name, tempfile.mkdtemp(), model=model)
    os.unlink(f.name)
    if not stems:
        st.error("Separation failed or Demucs unavailable.")
        return
    for path in stems:
        name = os.path.basename(path)
        with open(path, "rb") as sf_:
            data = sf_.read()
        audio_player(st, data, name)
        st.download_button(f"⬇ {name}", data, name, "audio/wav")


if __name__ == "__main__":
    main()
