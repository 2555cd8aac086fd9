"""Execute every demo UI graph once (VERDICT r4 item 9).

gradio/streamlit are not installable here, so construction runs against
the vendored stubs in tests/ui_stubs/ — components record kwargs, layout
primitives nest, and event bindings type-check their handler + component
lists. When the real libraries ARE installed (a richer CI tier), the
same tests construct the real Blocks graphs instead.

This catches the wiring-bug class the r4 verdict flagged: callbacks
renamed out from under a .click(), components used before creation,
handler/IO arity mistakes — all previously unexecuted code.
"""

from __future__ import annotations

import importlib
import os
import sys

import pytest

STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ui_stubs")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(module_name: str, lib: str):
    """Import a demo module fresh, preferring the real UI lib, falling
    back to the vendored stub."""
    try:
        importlib.import_module(lib)
        real = True
    except ImportError:
        real = False
        if STUBS not in sys.path:
            sys.path.insert(0, STUBS)
        importlib.invalidate_caches()
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    sys.modules.pop(module_name, None)
    mod = importlib.import_module(module_name)
    return mod, real


@pytest.fixture(autouse=True)
def _clean_stub_state():
    yield
    for name in ("gradio", "streamlit"):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__version__", "") == "0.0-stub":
            mod.reset()
            del sys.modules[name]
    if STUBS in sys.path:
        sys.path.remove(STUBS)


@pytest.mark.parametrize(
    "demo",
    ["demo.demo_gradio", "demo.demo_gradio_annotation", "demo.demo_gradio_batch"],
)
def test_gradio_graph_constructs(demo):
    mod, real = _load(demo, "gradio")
    app = mod.build_app()
    assert app is not None
    if not real:
        import gradio as gr

        assert getattr(gr, "__version__", "") == "0.0-stub"
        # The graph actually wired events and built components.
        assert len(gr.CONSTRUCTED) > 3, demo
        assert len(gr.EVENTS) >= 1, demo
        for ev in gr.EVENTS:
            assert callable(ev["fn"])


def test_streamlit_script_executes():
    mod, real = _load("demo.demo_streamlit", "streamlit")
    # The script body runs at import; with stub defaults (no upload, button
    # False) it must reach the end without touching the network.
    assert mod is not None
    if not real:
        import streamlit as st

        names = [c[0] for c in st.CALLS]
        assert "set_page_config" in names
        assert "radio" in names and "button" in names
