"""Streamlit application layer.

Seven apps mirroring the reference UI family (SURVEY.md §2.4): the Tuning
Center (aegis_app.py), Tuner Pro (aegis_tuner_pro.py), financial batch +
realtime + studio apps, the multi-engine MIDI sandbox, and the stem lab.

streamlit is an optional dependency — each app module import-gates it with a
clear message, and all engine logic lives in the core packages so the apps
are thin views.

Run:  streamlit run -m aegis_tpu.apps.tuning_center   (etc.)
"""
