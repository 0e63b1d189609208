"""Financial batch studio — one-shot v2 conversion UI with original-vs-MIDI
comparison players (merges the reference's financial_app.py and
aegis_financial_studio.py surfaces)."""

from __future__ import annotations

import tempfile

from aegis_tpu.apps.common import audio_player, require_streamlit, svg_panel
from aegis_tpu.engine.financial import AegisFinancialEngine
from aegis_tpu.midi.decode import midi_to_notes
from aegis_tpu.synth.fluidsynth import synthesize_midi
from aegis_tpu.viz.piano_roll import notes_to_svg


def main() -> None:
    st = require_streamlit()
    st.set_page_config(page_title="Aegis Financial Studio", layout="centered")
    st.title("🏦 Aegis TPU — Financial Studio")
    st.caption("Bollinger + MACD + RSI + harmonic analysis, one-shot")

    upload = st.file_uploader("Audio", type=["wav", "mp3", "ogg", "flac"])
    if upload is None:
        return

    if st.button("🚀 Convert"):
        engine = AegisFinancialEngine(sample_rate=22050)
        with tempfile.NamedTemporaryFile(suffix=".mid", delete=False) as out:
            out_path = out.name
        with st.status("Running 5-phase pipeline…"):
            path = engine.audio_to_midi_financial(upload.getvalue(), out_path)
        if path is None:
            st.error("No notes detected")
            return
        midi_bytes = open(path, "rb").read()
        notes = midi_to_notes(midi_bytes)
        svg_panel(st, notes_to_svg(notes, color_by_track=False,
                                   title=f"{len(notes)} notes"))

        st.subheader("Compare")
        audio_player(st, upload.getvalue(), "Original")
        wav = synthesize_midi(midi_bytes, sample_rate=22050)
        if wav:
            audio_player(st, wav, "MIDI rendering")
        st.download_button("⬇ MIDI", midi_bytes, "financial.mid", "audio/midi")


if __name__ == "__main__":
    main()
