"""Interactive CLI chat (working replacement for the reference's stale
serve/cli.py, whose imports no longer exist — SURVEY.md §2.1).

Loads a checkpoint, optionally attaches an image/video, and streams replies.
"""

from __future__ import annotations

import argparse


def main():
    from ..utils.misc import apply_platform_env
    apply_platform_env()  # PLATFORM=cpu offline drives (tunnel-less hosts)
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--image-file", default=None)
    ap.add_argument("--video-file", default=None)
    ap.add_argument("--temperature", type=float, default=0.2)
    ap.add_argument("--do-sample", action="store_true")
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--wire", default="i420", choices=("i420", "rgb"),
                    help="host->device frame wire (media/wire.py)")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="prompt-lookup speculative decoding for greedy "
                         "turns (inference/speculative.py)")
    args = ap.parse_args()

    from .. import model_init
    from ..inference.api import ChatSession

    # I420 frame wire by default (half the host->device bytes; media/wire.py)
    model, processor, tokenizer = model_init(args.model_path,
                                             wire=args.wire)

    tensor, modal = None, "text"
    if args.video_file:
        tensor, modal = processor["video"](args.video_file), "video"
    elif args.image_file:
        tensor, modal = processor["image"](args.image_file), "image"

    # prefix-cached multi-turn chat: the media is encoded and the history
    # prefilled ONCE; each later turn feeds only its new tokens
    # (inference/api.ChatSession; the reference re-prefills every turn)
    chat = ChatSession(tensor, model, tokenizer, modal=modal,
                       do_sample=args.do_sample,
                       temperature=args.temperature,
                       max_new_tokens=args.max_new_tokens,
                       speculative_k=args.speculative)
    print("Type your message ('exit' to quit).")
    while True:
        try:
            text = input("USER: ")
        except EOFError:
            break
        if text.strip().lower() in ("exit", "quit"):
            break
        print(f"ASSISTANT: {chat.ask(text)}")


if __name__ == "__main__":
    main()
