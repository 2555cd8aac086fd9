"""Minimal Streamlit UI (reference ``demo/demo_streamlit.py`` analog).

Shows the raw client-side post-processing path: direct server call ->
``post_process_cells`` -> ``draw_layout_on_image`` -> ``layoutjson2md`` +
``fix_streamlit_formulas`` (reference ``:119-209``). Run:
``streamlit run demo/demo_streamlit.py``.
"""

import json

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover - UI-only dependency
    raise SystemExit("demo_streamlit requires `pip install streamlit`") from e

from PIL import Image

from dots_ocr_tpu.client.inference import inference_with_server
from dots_ocr_tpu.utils.boxes import post_process_cells
from dots_ocr_tpu.utils.image_io import fetch_image
from dots_ocr_tpu.utils.markdown import fix_streamlit_formulas, layoutjson2md
from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt
from dots_ocr_tpu.utils.visualize import draw_layout_on_image

st.set_page_config(page_title="dots.ocr (TPU)", layout="wide")
st.title("dots.ocr — TPU-native document parser")

with st.sidebar:
    ip = st.text_input("Server IP", "localhost")
    port = st.number_input("Port", value=8000, step=1)
    prompt_mode = st.selectbox(
        "Prompt mode", list(dict_promptmode_to_prompt), index=0
    )
    temperature = st.slider("Temperature", 0.0, 1.0, 0.1)
    max_tokens = st.number_input("Max completion tokens", value=16384, step=1024)

uploaded = st.file_uploader("Image", type=["jpg", "jpeg", "png"])
if uploaded and st.button("Parse", type="primary"):
    origin = Image.open(uploaded).convert("RGB")
    resized = fetch_image(origin, min_pixels=None, max_pixels=None)
    model_input = fetch_image(origin, min_pixels=3136, max_pixels=11289600)
    with st.spinner("running inference..."):
        response = inference_with_server(
            model_input,
            dict_promptmode_to_prompt[prompt_mode],
            ip=ip,
            port=int(port),
            temperature=float(temperature),
            max_completion_tokens=int(max_tokens),
        )
    if response is None:
        st.error("request failed — is the server running?")
    elif prompt_mode in ("prompt_layout_all_en", "prompt_layout_only_en"):
        try:
            cells = json.loads(response)
            cells = post_process_cells(
                origin, cells, model_input.width, model_input.height
            )
            col1, col2 = st.columns(2)
            with col1:
                st.image(draw_layout_on_image(origin, cells), caption="Layout")
            with col2:
                if prompt_mode == "prompt_layout_all_en":
                    md = layoutjson2md(origin, cells)
                    st.markdown(fix_streamlit_formulas(md), unsafe_allow_html=True)
                else:
                    st.json(cells)
        except Exception as e:  # noqa: BLE001
            st.warning(f"output was not valid layout JSON ({e}); raw response:")
            st.text(response)
    else:
        st.markdown(fix_streamlit_formulas(response), unsafe_allow_html=True)
