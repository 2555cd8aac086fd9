from setuptools import find_packages, setup

setup(
    name="dots_ocr_tpu",
    version="0.1.0",
    description=(
        "TPU-native document parsing framework with the capabilities of "
        "rednote-hilab/dots.ocr: JAX/Pallas VLM, paged-KV continuous "
        "batching, OpenAI-compatible serving, DotsOCRParser-compatible API"
    ),
    packages=find_packages(include=["dots_ocr_tpu", "dots_ocr_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax>=0.4.30",
        "numpy",
        "pillow",
        "requests",
        "aiohttp",
        "tokenizers",
        "safetensors",
        "optax",
    ],
    extras_require={
        "demo": ["gradio", "streamlit"],
        "eval": ["huggingface_hub"],
        "train": ["orbax-checkpoint"],
    },
    entry_points={
        "console_scripts": [
            "dots-ocr-parse=dots_ocr_tpu.cli:main",
            "dots-ocr-serve=dots_ocr_tpu.serve.server:main",
        ]
    },
)
