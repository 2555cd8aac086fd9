"""Download the dots.ocr checkpoint into ./weights/DotsOCR.

Mirror of the reference downloader (``tools/download_model.py:1-24``):
HuggingFace snapshot by default, ModelScope with --type modelscope. The
target directory name must not contain '.' (the HF dynamic-module loader
chokes on dotted paths).
"""

import argparse
import os

parser = argparse.ArgumentParser()
parser.add_argument(
    "--type", type=str, default="huggingface", choices=["huggingface", "modelscope"]
)
parser.add_argument("--name", type=str, default="rednote-hilab/dots.ocr")
parser.add_argument("--dest", type=str, default="./weights/DotsOCR")


def main():
    args = parser.parse_args()
    if "." in os.path.basename(args.dest):
        print("warning: destination directory name should not contain '.'")
    os.makedirs(args.dest, exist_ok=True)
    if args.type == "huggingface":
        from huggingface_hub import snapshot_download

        snapshot_download(
            repo_id=args.name, local_dir=args.dest, resume_download=True
        )
    else:
        from modelscope import snapshot_download

        snapshot_download(args.name, local_dir=args.dest)
    print(f"model downloaded to {args.dest}")


if __name__ == "__main__":
    main()
