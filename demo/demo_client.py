"""Single-request client demo against the TPU server (reference
``demo/demo_vllm.py`` analog): one image + one prompt mode."""

import argparse

from dots_ocr_tpu.client.inference import inference_with_server
from dots_ocr_tpu.utils.image_io import fetch_image
from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="demo/demo_image1.jpg")
    ap.add_argument("--ip", default="localhost")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument(
        "--prompt_mode", default="prompt_layout_all_en",
        choices=list(dict_promptmode_to_prompt),
    )
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument("--max_completion_tokens", type=int, default=16384)
    args = ap.parse_args()

    image = fetch_image(args.image)
    prompt = dict_promptmode_to_prompt[args.prompt_mode]
    response = inference_with_server(
        image,
        prompt,
        ip=args.ip,
        port=args.port,
        temperature=args.temperature,
        top_p=args.top_p,
        max_completion_tokens=args.max_completion_tokens,
    )
    print(f"response: {response}")


if __name__ == "__main__":
    main()
