"""Minimal streamlit API stub for headless script-execution tests.

Widgets return their defaults (buttons False, uploaders None, radios the
first option), so running demo_streamlit.py top-to-bottom exercises every
construction-time code path without a browser or server. Prefer the real
streamlit when installed (tests/test_ui_graphs.py checks)."""

from __future__ import annotations

import contextlib
from typing import Any, List

CALLS: List[tuple] = []


class _StopScript(Exception):
    pass


def _record(name, *args, **kwargs):
    CALLS.append((name, args, kwargs))


def set_page_config(**kw):
    _record("set_page_config", **kw)


def title(t):
    _record("title", t)


def header(t):
    _record("header", t)


def subheader(t):
    _record("subheader", t)


def markdown(t, **kw):
    _record("markdown", t)


def write(t, **kw):
    _record("write", t)


def error(t):
    _record("error", t)


def info(t):
    _record("info", t)


def json(obj):
    _record("json", obj)


def image(img, **kw):
    _record("image", img)


def text_area(label, value="", **kw):
    _record("text_area", label)
    return value


def text_input(label, value="", **kw):
    _record("text_input", label)
    return value


def number_input(label, value=0, **kw):
    _record("number_input", label)
    return value


def slider(label, lo=0.0, hi=1.0, value=0.0, **kw):
    _record("slider", label)
    return value


def selectbox(label, options, index=0, **kw):
    _record("selectbox", label)
    options = list(options)
    return options[index] if options else None


def radio(label, options, **kw):
    _record("radio", label)
    options = list(options)
    return options[0] if options else None


def button(label, **kw):
    _record("button", label)
    return False


def file_uploader(label, **kw):
    _record("file_uploader", label)
    return None


def stop():
    raise _StopScript()


@contextlib.contextmanager
def spinner(text=""):
    _record("spinner", text)
    yield


class _Columns:
    def __init__(self, n):
        self._cols = [_Col() for _ in range(n)]

    def __iter__(self):
        return iter(self._cols)


class _Col:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def columns(n):
    _record("columns", n)
    return _Columns(n if isinstance(n, int) else len(n))


class _Sidebar:
    def __getattr__(self, name: str) -> Any:
        fn = globals().get(name)
        if fn is None:
            raise AttributeError(name)
        return fn


sidebar = _Sidebar()


def reset() -> None:
    CALLS.clear()


__version__ = "0.0-stub"
