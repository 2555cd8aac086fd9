"""Streamlit UI (reference ``demo/demo_streamlit.py`` analog, full surface).

Feature parity with the reference page (``:62-215``): sidebar config
(server, prompt mode, min/max pixels), three image input modes (upload /
URL-or-path / bundled test image), the layout pipeline
(``post_process_cells`` -> ``draw_layout_on_image`` -> ``layoutjson2md`` +
``fix_streamlit_formulas``), plus the raw-output and post-processed text
areas and dimension readouts. All decision logic lives in
``dots_ocr_tpu.ui.callbacks`` (pure, headless-tested); this file is
streamlit wiring only. Run: ``streamlit run demo/demo_streamlit.py``.
"""

import glob
import os

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover - UI-only dependency
    raise SystemExit("demo_streamlit requires `pip install streamlit`") from e

from dots_ocr_tpu.client.inference import inference_with_server
from dots_ocr_tpu.ui.callbacks import process_layout_response, resolve_image_input
from dots_ocr_tpu.utils.consts import MAX_PIXELS, MIN_PIXELS
from dots_ocr_tpu.utils.image_io import fetch_image
from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt

st.set_page_config(page_title="dots.ocr (TPU)", layout="wide")
st.title("🔍 dots.ocr — TPU-native document parser")


def config_sidebar() -> dict:
    cfg = {}
    st.sidebar.header("Configuration Parameters")
    cfg["prompt_mode"] = st.sidebar.selectbox(
        "Prompt Mode", list(dict_promptmode_to_prompt), index=0
    )
    cfg["ip"] = st.sidebar.text_input("Server IP", "localhost")
    cfg["port"] = st.sidebar.number_input(
        "Port", min_value=1, max_value=65535, value=8000
    )
    st.sidebar.subheader("Image Configuration")
    cfg["min_pixels"] = st.sidebar.number_input("Min Pixels", value=MIN_PIXELS)
    cfg["max_pixels"] = st.sidebar.number_input("Max Pixels", value=MAX_PIXELS)
    cfg["temperature"] = st.sidebar.slider("Temperature", 0.0, 1.0, 0.1)
    cfg["max_tokens"] = st.sidebar.number_input(
        "Max completion tokens", value=16384, step=1024
    )
    st.sidebar.info(
        f"Current Prompt: {dict_promptmode_to_prompt[cfg['prompt_mode']][:160]}…"
    )
    return cfg


def image_input():
    st.markdown("#### Image Input")
    mode = st.radio(
        "Select input method",
        ["Upload Image", "Enter Image URL/Path", "Select Test Image"],
        horizontal=True,
        label_visibility="collapsed",
    )
    uploaded = url = test = None
    if mode == "Upload Image":
        uploaded = st.file_uploader("Upload Image", type=["png", "jpg", "jpeg"])
    elif mode == "Enter Image URL/Path":
        url = st.text_input("Enter Image URL/Path")
    else:
        tests = sorted(glob.glob(os.path.join("demo", "assets", "*.jpg"))) + sorted(
            glob.glob(os.path.join("demo", "assets", "*.png"))
        )
        test = st.selectbox("Select Test Image", [""] + tests)
    return resolve_image_input(uploaded, url or "", test or "")


cfg = config_sidebar()
origin, source = image_input()
if origin is not None:
    st.write(f"Original Dimensions: {origin.width} x {origin.height}")

if st.button("🚀 Start Inference", type="primary"):
    if origin is None:
        st.info(source if source else "Please select an image first")
        st.stop()
    model_input = fetch_image(
        origin, min_pixels=int(cfg["min_pixels"]), max_pixels=int(cfg["max_pixels"])
    )
    st.write(f"Input Dimensions: {model_input.width} x {model_input.height}")
    with st.spinner(f"Inferring... Server: {cfg['ip']}:{cfg['port']}"):
        response = inference_with_server(
            model_input,
            dict_promptmode_to_prompt[cfg["prompt_mode"]],
            ip=cfg["ip"],
            port=int(cfg["port"]),
            temperature=float(cfg["temperature"]),
            max_completion_tokens=int(cfg["max_tokens"]),
        )
    view = process_layout_response(
        origin, response, cfg["prompt_mode"], model_input.width, model_input.height
    )
    if view["kind"] == "error":
        st.error(view["message"])
    elif view["kind"] == "invalid":
        st.error(f"Model output is not a valid JSON format ({view['message']})")
        st.text_area("Original Model Output", view["raw"], height=200)
    elif view["kind"] == "text":
        st.markdown(view["markdown"], unsafe_allow_html=True)
    else:
        col1, col2 = st.columns(2)
        with col1:
            st.markdown("##### Visualization Result")
            st.image(view["image"], width=view["image"].width)
        with col2:
            if view["markdown"] is not None:
                st.markdown("##### Markdown Format")
                st.markdown(view["markdown"], unsafe_allow_html=True)
            else:
                st.json(view["cells"])
        st.markdown("---")
        st.text_area("Original Model Output", view["raw"], height=200)
        st.text_area("Post-processed Result", str(view["cells"]), height=200)
