"""Image -> SVG generation demo (reference ``demo/demo_vllm_svg.py`` analog).

Fills the viewBox placeholder with the smart-resized input dimensions and
samples at temperature 0.9 — low temperatures cause repetition loops on
long SVG decodes (reference demo_vllm_svg.py:35, assets/blog.md:1028).
"""

import argparse

from dots_ocr_tpu.client.inference import inference_with_server
from dots_ocr_tpu.utils.image_io import fetch_image
from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--ip", default="localhost")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--model_name", default="model")
    ap.add_argument("--temperature", type=float, default=0.9)
    ap.add_argument("--top_p", type=float, default=0.9)
    ap.add_argument("--max_completion_tokens", type=int, default=16384)
    ap.add_argument("--output", default=None, help="write the SVG here")
    args = ap.parse_args()

    image = fetch_image(args.image, min_pixels=None, max_pixels=None)
    resized = fetch_image(image, min_pixels=28 * 28 * 4, max_pixels=11289600)
    prompt = dict_promptmode_to_prompt["prompt_image_to_svg"].format(
        width=resized.width, height=resized.height
    )
    response = inference_with_server(
        resized,
        prompt,
        ip=args.ip,
        port=args.port,
        model_name=args.model_name,
        temperature=args.temperature,
        top_p=args.top_p,
        max_completion_tokens=args.max_completion_tokens,
    )
    if args.output and response:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(response)
        print(f"SVG written to {args.output}")
    else:
        print(response)


if __name__ == "__main__":
    main()
