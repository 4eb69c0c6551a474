"""Serving example: start the micro-batched HTTP server, hit it with clients.

Run the server (synthetic weights are fine for a smoke):

    python -m pytorch_yolo_tpu serve --model yolov3-tiny --port 8080

then fire concurrent clients at it:

    python examples/serving_client.py --url http://127.0.0.1:8080 \
        --image path/to/dog.jpg --concurrency 8 --requests 64

The server coalesces the concurrent requests into device batches (watch
GET /stats), so client-side throughput scales with --concurrency without
any client-side batching.
"""

import argparse
import concurrent.futures
import json
import time
import urllib.request


def detect(url: str, payload: bytes) -> dict:
    req = urllib.request.Request(f"{url}/detect", data=payload, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8080")
    ap.add_argument("--image", required=True)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    args = ap.parse_args()

    with open(args.image, "rb") as f:
        payload = f.read()

    detect(args.url, payload)  # warm the connection + first batch
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(args.concurrency) as pool:
        results = list(pool.map(lambda _: detect(args.url, payload),
                                range(args.requests)))
    dt = time.perf_counter() - t0
    n_boxes = [len(r["boxes"]) for r in results]
    print(f"{args.requests} requests x{args.concurrency} concurrent: "
          f"{args.requests / dt:.1f} req/s  "
          f"(boxes per response: min {min(n_boxes)} max {max(n_boxes)})")
    with urllib.request.urlopen(f"{args.url}/stats", timeout=30) as r:
        print("server stats:", r.read().decode())


if __name__ == "__main__":
    main()
