"""Round-robin task dispatch over a pool of API servers (reference:
scripts/server/post_multi_servers.py)."""

import argparse
import json
import itertools
import urllib.request


def pick_idle(ports):
    for port in ports:
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/service/status", timeout=5) as r:
                if json.loads(r.read())["service_status"] == "idle":
                    return port
        except Exception:
            continue
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ports", type=int, nargs="+", required=True)
    p.add_argument("--prompts", nargs="+", required=True)
    args = p.parse_args()
    pool = itertools.cycle(args.ports)
    for prompt in args.prompts:
        port = pick_idle(args.ports) or next(pool)
        body = json.dumps({"prompt": prompt}).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/v1/tasks", data=body,
                                     headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        print(f"port {port}: {out['task_id']}")


if __name__ == "__main__":
    main()
