"""Stop the running task (reference: scripts/server/stop_running_task.py)."""

import argparse
import json
import urllib.request


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    args = p.parse_args()
    req = urllib.request.Request(args.url + "/v1/tasks/running", method="DELETE")
    with urllib.request.urlopen(req) as r:
        print(json.dumps(json.loads(r.read()), indent=2))


if __name__ == "__main__":
    main()
