"""dots_ocr_tpu: a TPU-native (JAX/XLA/Pallas/pjit) document-parsing framework.

A from-scratch rebuild of the capabilities of rednote-hilab/dots.ocr: one
~3B vision-language model (NaViT-style 1.2B vision encoder + Qwen2.5-1.5B
decoder) parses PDFs/images into layout JSON, OCR text, grounded OCR,
webpage structure, scene text, and SVG — switched purely by prompt — served
by a TPU-resident paged-KV continuous-batching engine behind an
OpenAI-compatible HTTP API.

Public surface mirrors the reference package (``dots_ocr/__init__.py``):
``DotsOCRParser`` and ``dict_promptmode_to_prompt``. The heavy imports (JAX,
the model) are deferred: importing this package pulls only the host-side
pipeline.
"""

from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt

__version__ = "0.1.0"

__all__ = ["DotsOCRParser", "dict_promptmode_to_prompt", "__version__"]


def __getattr__(name):
    if name == "DotsOCRParser":
        from dots_ocr_tpu.parser import DotsOCRParser

        return DotsOCRParser
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
