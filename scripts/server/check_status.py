"""Poll task/service status (reference: scripts/server/check_status.py)."""

import argparse
import json
import time
import urllib.request


def get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--task_id", default=None)
    p.add_argument("--wait", action="store_true")
    args = p.parse_args()
    if args.task_id is None:
        print(json.dumps(get(args.url + "/v1/service/status"), indent=2))
        return
    while True:
        st = get(f"{args.url}/v1/tasks/{args.task_id}/status")
        print(json.dumps(st))
        if not args.wait or st["status"] in ("completed", "failed"):
            break
        time.sleep(5)


if __name__ == "__main__":
    main()
