"""Free-form VQA demo (reference ``demo/demo_vllm_general.py`` analog):
custom question + system prompt over an image."""

import argparse

from dots_ocr_tpu.client.inference import inference_with_server
from dots_ocr_tpu.utils.image_io import fetch_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", default="Describe this image.")
    ap.add_argument("--system_prompt", default="You are a helpful assistant.")
    ap.add_argument("--ip", default="localhost")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--top_p", type=float, default=0.9)
    args = ap.parse_args()

    image = fetch_image(args.image)
    response = inference_with_server(
        image,
        args.prompt,
        ip=args.ip,
        port=args.port,
        temperature=args.temperature,
        top_p=args.top_p,
        system_prompt=args.system_prompt,
    )
    print(f"response: {response}")


if __name__ == "__main__":
    main()
