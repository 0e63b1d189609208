"""Piano-roll visualizers.

Four engines, mirroring the reference's visualizer family
(aegis_engine_core/visualizers.py):

  * ``svg`` — pure-Python MIDI/event -> SVG renderer, zero dependencies,
    works offline (:6-100).  This is the default and also powers the
    financial realtime app's main=green / safe=pink roll
    (financial_app_realtime.py:31-119).
  * ``html_midi_player`` — <midi-player> web-component embed (:102-119)
  * ``tonejs`` — @tonejs/midi + canvas renderer embed (:121-177)
  * ``webaudiofont`` — WebAudioFont player embed (:179-187)

The three embed engines return self-contained HTML strings (CDN-based; the
host app decides whether to use them).  ``render_piano_roll`` is the
dispatcher (:189-213).
"""

from __future__ import annotations

import base64
import html
from typing import List, Union

from aegis_tpu.midi.decode import midi_to_notes

TRACK_COLORS = {"main": "#34c759", "safe": "#ff6b9d"}  # green / pink
DEFAULT_COLOR = "#4a9eff"


def _note_rects(notes: List[dict], width: int, height: int,
                color_by_track: bool = False):
    if not notes:
        return [], 0.0, (60, 72)
    t_max = max(n["end"] for n in notes) or 1.0
    lo = min(n["note"] for n in notes) - 2
    hi = max(n["note"] for n in notes) + 2
    span = max(hi - lo, 12)
    rects = []
    for n in notes:
        x = n["start"] / t_max * width
        w = max((n["end"] - n["start"]) / t_max * width, 2.0)
        y = height - (n["note"] - lo + 1) / span * height
        h = max(height / span - 1, 2.0)
        if color_by_track:
            color = TRACK_COLORS.get(n.get("track", ""), DEFAULT_COLOR)
        else:
            color = DEFAULT_COLOR
        vel = n.get("velocity", 100)
        rects.append((x, y, w, h, color, 0.35 + 0.65 * min(vel, 127) / 127.0, n))
    return rects, t_max, (lo, hi)


def notes_to_svg(notes: List[dict], width: int = 880, height: int = 320,
                 color_by_track: bool = False, title: str = "") -> str:
    """Self-contained SVG piano roll from a note list ({note, start, end,
    velocity[, track]}, seconds)."""
    rects, t_max, (lo, hi) = _note_rects(notes, width, height, color_by_track)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height + 24}" viewBox="0 0 {width} {height + 24}">',
        f'<rect width="{width}" height="{height}" fill="#14161c"/>',
    ]
    # octave grid lines
    for note in range((lo // 12) * 12, hi + 12, 12):
        y = height - (note - lo + 1) / max(hi - lo, 12) * height
        if 0 <= y <= height:
            parts.append(
                f'<line x1="0" y1="{y:.1f}" x2="{width}" y2="{y:.1f}" '
                f'stroke="#2a2e3a" stroke-width="0.5"/>'
            )
    # second ticks
    for s in range(int(t_max) + 1):
        x = s / max(t_max, 1e-6) * width
        parts.append(
            f'<line x1="{x:.1f}" y1="0" x2="{x:.1f}" y2="{height}" '
            f'stroke="#232734" stroke-width="0.5"/>'
            f'<text x="{x + 2:.1f}" y="{height + 14}" fill="#8a8fa3" '
            f'font-size="10">{s}s</text>'
        )
    for x, y, w, h, color, opacity, _ in rects:
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{w:.1f}" height="{h:.1f}" '
            f'rx="1.5" fill="{color}" fill-opacity="{opacity:.2f}"/>'
        )
    if title:
        parts.append(
            f'<text x="8" y="16" fill="#d0d4e0" font-size="12">'
            f"{html.escape(title)}</text>"
        )
    parts.append("</svg>")
    return "".join(parts)


def events_to_svg(events: List[dict], sr: int, hop_length: int,
                  **kwargs) -> str:
    """Frame-indexed engine events -> SVG (main/safe colored)."""
    spf = hop_length / sr
    notes = [
        {"note": e["note"], "start": e["start"] * spf, "end": e["end"] * spf,
         "velocity": e.get("velocity", 100), "track": e.get("track", "main")}
        for e in events
    ]
    kwargs.setdefault("color_by_track", True)
    return notes_to_svg(notes, **kwargs)


def midi_to_svg(midi_data: Union[bytes, str], **kwargs) -> str:
    return notes_to_svg(midi_to_notes(midi_data), **kwargs)


# ---------------------------------------------------------------- CDN embeds

def _midi_data_url(midi_data: bytes) -> str:
    return "data:audio/midi;base64," + base64.b64encode(midi_data).decode()


def html_midi_player_embed(midi_data: bytes, height: int = 360) -> str:
    url = _midi_data_url(midi_data)
    return f"""
<script src="https://cdn.jsdelivr.net/combine/npm/tone@14.7.58,npm/@magenta/music@1.23.1/es6/core.js,npm/focus-visible@5,npm/html-midi-player@1.5.0"></script>
<midi-player src="{url}" sound-font visualizer="#aegisViz" style="width:100%"></midi-player>
<midi-visualizer type="piano-roll" id="aegisViz" src="{url}" style="height:{height}px"></midi-visualizer>
"""


def tonejs_canvas_embed(midi_data: bytes, height: int = 360) -> str:
    url = _midi_data_url(midi_data)
    return f"""
<script src="https://cdn.jsdelivr.net/npm/@tonejs/midi@2.0.28/build/Midi.min.js"></script>
<canvas id="aegisRoll" width="880" height="{height}" style="width:100%;background:#14161c"></canvas>
<script>
fetch("{url}").then(r => r.arrayBuffer()).then(buf => {{
  const midi = new Midi(buf);
  const cv = document.getElementById("aegisRoll"), ctx = cv.getContext("2d");
  const notes = midi.tracks.flatMap(t => t.notes);
  if (!notes.length) return;
  const tMax = Math.max(...notes.map(n => n.time + n.duration));
  const lo = Math.min(...notes.map(n => n.midi)) - 2;
  const hi = Math.max(...notes.map(n => n.midi)) + 2;
  for (const n of notes) {{
    ctx.fillStyle = "#4a9eff";
    ctx.globalAlpha = 0.35 + 0.65 * n.velocity;
    ctx.fillRect(n.time / tMax * cv.width,
                 cv.height - (n.midi - lo + 1) / (hi - lo) * cv.height,
                 Math.max(n.duration / tMax * cv.width, 2),
                 Math.max(cv.height / (hi - lo) - 1, 2));
  }}
}});
</script>
"""


def webaudiofont_embed(midi_data: bytes) -> str:
    url = _midi_data_url(midi_data)
    return f"""
<script src="https://surikov.github.io/webaudiofont/npm/dist/WebAudioFontPlayer.js"></script>
<p>WebAudioFont player: <a download="aegis.mid" href="{url}">download MIDI</a></p>
"""


def render_piano_roll(midi_data: bytes, engine: str = "svg", **kwargs) -> str:
    """Dispatcher across the four engines; returns SVG or HTML markup."""
    if engine == "svg":
        return midi_to_svg(midi_data, **kwargs)
    if engine == "html_midi_player":
        return html_midi_player_embed(midi_data, **kwargs)
    if engine == "tonejs":
        return tonejs_canvas_embed(midi_data, **kwargs)
    if engine == "webaudiofont":
        return webaudiofont_embed(midi_data)
    raise ValueError(f"unknown visualizer engine: {engine}")
