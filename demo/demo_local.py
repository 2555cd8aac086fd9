"""In-process engine demo (reference ``demo/demo_hf.py`` analog): loads the
checkpoint into the JAX engine in this process and runs every prompt mode
once over the demo image — the all-modes smoke test."""

import argparse

from dots_ocr_tpu.engine.engine import InferenceEngine
from dots_ocr_tpu.utils.image_io import fetch_image
from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="demo/demo_image1.jpg")
    ap.add_argument("--weights", default="./weights/DotsOCR")
    ap.add_argument("--random-tiny", action="store_true",
                    help="tiny random model (plumbing smoke test, no weights)")
    ap.add_argument("--max_new_tokens", type=int, default=2048)
    args = ap.parse_args()

    if args.random_tiny:
        engine = InferenceEngine.random_init()
    else:
        engine = InferenceEngine.from_pretrained(args.weights)
    image = fetch_image(args.image)

    for prompt_mode, prompt in dict_promptmode_to_prompt.items():
        temperature = 0.9 if prompt_mode == "prompt_image_to_svg" else 0.1
        response = engine.generate_one(
            prompt,
            images=[image],
            temperature=temperature,
            max_new_tokens=args.max_new_tokens,
        )
        print(f"prompt mode: {prompt_mode}")
        print(f"prompt: {prompt}")
        print(f"response: {response}\n")


if __name__ == "__main__":
    main()
