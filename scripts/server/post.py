"""Submit a generation task to a running API server (reference:
scripts/server/post.py)."""

import argparse
import json
import urllib.request


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--prompt", required=True)
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--image_path", default="")
    p.add_argument("--save_video_path", default="")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    body = {k: v for k, v in vars(args).items() if k != "url" and v not in ("", None)}
    req = urllib.request.Request(args.url + "/v1/tasks", data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        print(json.dumps(json.loads(r.read()), indent=2))


if __name__ == "__main__":
    main()
