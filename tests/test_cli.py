"""Unified CLI (aegis_tpu/__main__.py): every subcommand through main()."""

import numpy as np
import pytest

from aegis_tpu.__main__ import main
from aegis_tpu.io import write_wav
from aegis_tpu.tools.signal_gen import two_tone


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "clip.wav"
    write_wav(str(p), two_tone(sr=22050), 22050)
    return str(p)


def test_transcribe(wav_path, tmp_path, capsys):
    out = str(tmp_path / "o.mid")
    rc = main(["transcribe", wav_path, out, "--sr", "22050",
               "--confidence", "0.4", "--bpm", "auto"])
    assert rc == 0
    from aegis_tpu.midi.decode import midi_to_notes

    with open(out, "rb") as f:
        notes = midi_to_notes(f.read())
    assert {n["note"] for n in notes} >= {55, 62}


def test_financial(wav_path, tmp_path):
    out = str(tmp_path / "f.mid")
    assert main(["financial", wav_path, out]) == 0
    # the reference's v2 pitch semantics stay reachable as an opt-in
    out2 = str(tmp_path / "f_trend.mid")
    assert main(["financial", wav_path, out2,
                 "--pitch-source", "trend", "--no-onsets"]) == 0


def test_poly(wav_path, tmp_path):
    out = str(tmp_path / "p.mid")
    assert main(["poly", wav_path, out]) == 0


def test_tabs(wav_path, capsys):
    assert main(["tabs", wav_path, "--sr", "22050"]) == 0
    text = capsys.readouterr().out
    assert "e|" in text and "E|" in text


def test_tabs_poly_chords(tmp_path, capsys):
    """tabs --engine poly prints the named chord line above the tab."""
    from aegis_tpu.tools.signal_gen import karplus_strong

    sr, dur = 22050, 1.2
    rng = np.random.default_rng(0)
    n = int(sr * dur)
    y = np.zeros(n, np.float32)
    for m in (60, 64, 67):
        f = 440.0 * 2 ** ((m - 69) / 12)
        y[:n] += karplus_strong(f, dur, sr, rng=rng)[:n]
    p = str(tmp_path / "chord.wav")
    write_wav(p, (y / np.abs(y).max() * 0.8).astype(np.float32), sr)

    assert main(["tabs", p, "--sr", "22050", "--engine", "poly"]) == 0
    text = capsys.readouterr().out
    assert "0.00s C" in text and "e|" in text, text


def test_stems_hpss(wav_path, tmp_path, monkeypatch):
    from aegis_tpu.synth import stems

    monkeypatch.setattr(stems, "find_demucs", lambda: None)
    assert main(["stems", wav_path, str(tmp_path), "--method", "hpss"]) == 0


def test_warmup(capsys):
    assert main(["warmup", "--seconds", "0.5", "--sr", "22050",
                 "--pipelines", "v1,poly"]) == 0
    out = capsys.readouterr().out
    assert "warm" in out and "v1" in out and "poly" in out


def test_warmup_rejects_unknown_pipeline(capsys):
    assert main(["warmup", "--pipelines", "v1,nonsense"]) == 1
    assert "nonsense" in capsys.readouterr().err


def test_default_output_path(wav_path, capsys):
    rc = main(["transcribe", wav_path, "--sr", "22050"])
    assert rc == 0
    assert wav_path.replace(".wav", ".mid") in capsys.readouterr().out


def test_bad_args():
    with pytest.raises(SystemExit):
        main(["transcribe"])  # missing input
    with pytest.raises(SystemExit):
        main(["nonsense"])


def test_batch(tmp_path, capsys):
    for i, f in enumerate((196.0, 293.66)):
        write_wav(str(tmp_path / f"t{i}.wav"),
                  two_tone(sr=22050), 22050)
    rc = main(["batch", str(tmp_path), "--confidence", "0.4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("-> ") == 2
    import glob

    assert len(glob.glob(str(tmp_path / "*.mid"))) == 2


def test_batch_engines(tmp_path, capsys):
    """batch --engine financial|poly runs those pipelines per track."""
    write_wav(str(tmp_path / "t.wav"), two_tone(sr=22050), 22050)
    for eng in ("financial", "poly"):
        out_dir = tmp_path / eng
        rc = main(["batch", str(tmp_path), "--output-dir", str(out_dir),
                   "--engine", eng])
        assert rc == 0, eng
        import glob

        mids = glob.glob(str(out_dir / "*.mid"))
        assert len(mids) == 1, eng
        from aegis_tpu.midi.decode import midi_to_notes

        notes = {n["note"] for n in midi_to_notes(open(mids[0], "rb").read())}
        assert notes & {55, 62}, (eng, notes)


def test_invalid_bpm_and_range_rejected(wav_path, tmp_path, capsys):
    """Review findings: --bpm 0 used to crash deep in the MIDI tick math;
    --end < --start silently transcribed the wrong region."""
    out = str(tmp_path / "x.mid")
    for bad in ("0", "nan", "-10", "abc"):
        with pytest.raises(SystemExit) as exc:
            main(["transcribe", wav_path, out, "--bpm", bad])
        assert exc.value.code == 2
    with pytest.raises(SystemExit) as exc:
        main(["transcribe", wav_path, out, "--start", "1.0", "--end", "0.5"])
    assert exc.value.code == 2


def test_stream(wav_path, tmp_path, capsys, monkeypatch):
    """The stream command reads s16le PCM from stdin, prints live + final
    event JSON lines, and writes MIDI at EOF."""
    import io as _io
    import json

    y = two_tone(sr=22050)
    pcm = np.round(np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()
    out = str(tmp_path / "s.mid")
    monkeypatch.setattr("sys.stdin",
                        type("S", (), {"buffer": _io.BytesIO(pcm)})())
    assert main(["stream", out, "--engine", "v1", "--sr", "22050",
                 "--poll-every", "1.0", "--confidence", "0.5"]) == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    final = json.loads(lines[-1])
    assert final["live"] is False
    assert {e["note"] for e in final["events"]} >= {55, 62}
    from aegis_tpu.midi.decode import midi_to_notes

    with open(out, "rb") as f:
        assert len(midi_to_notes(f.read())) == final["n"]


def test_warmup_live_pipelines(capsys):
    """live-* warmup pipelines compile the fixed-shape streaming tile
    programs so a first live session never pays a cold compile."""
    assert main(["warmup", "--seconds", "0.5", "--sr", "22050",
                 "--pipelines", "live-v1,live-financial,live-poly"]) == 0
    out = capsys.readouterr().out
    assert "live-poly" in out and "live-financial" in out
