#!/usr/bin/env python
"""End-to-end HTTP serving load test (VERDICT r4 ask #7).

The device-level StreamPool curve (tools/bench_streampool.py, recorded in
serving.py) says nothing about what a CLIENT sees through server.py's 5 ms
aggregation tick, the per-tick host<->TPU dispatch, and the motion-row fetch
over the dev tunnel. This drives N concurrent stdlib-HTTP clients against an
in-process MotionServer, each streaming back-to-back 4 s windows, and
records per-chunk latency percentiles + aggregate throughput:

    python tools/bench_http_serving.py [--clients 1 4 8 16] [--windows 6]
                                       [--precision int8|fast|exact]

Each client holds one session and keeps exactly one chunk in flight (the
server 409s pipelined chunks per session), so N clients = N-deep batching at
the tick. Back-to-back streaming saturates the server; a real-time client
posts one window per 4 s, so the reported per-chunk p50 is the latency floor
and (4000 / p50) * N bounds the real-time session count this HTTP tier
sustains at that concurrency.

Numbers land in serving.py's docstring next to the device curve.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, ".")


def client_loop(port: int, windows: int, window_samples: int, seed: int,
                results: list, barrier: threading.Barrier):
    import http.client

    import numpy as np

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=1800)
    try:
        conn.request("POST", "/v1/sessions", body=json.dumps({}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200, (resp.status, body)
        sid = json.loads(body)["sid"]

        rng = np.random.default_rng(seed)
        pcm = (rng.standard_normal(window_samples).astype(np.float32) * 0.1)
        payload = pcm.tobytes()

        # warmup chunk(s): the FIRST tick at a new capacity pays the
        # batched-step compile, which can exceed the server's 600 s tick
        # timeout (observed: B=16 int8 batch-tiled compile > 10 min) -- a
        # 504 here means "compile still running server-side", so retry:
        # the retry's submit lands on the tick after the compile finishes
        for attempt in range(4):
            conn.request("POST", f"/v1/sessions/{sid}/audio", body=payload,
                         headers={"Content-Type": "application/octet-stream"})
            r = conn.getresponse()
            r.read()
            if r.status == 200:
                break
            assert r.status == 504, r.status
        else:
            raise TimeoutError("warmup never completed (4 x 600 s)")
        barrier.wait()

        lat = []
        t_begin = time.perf_counter()
        for _ in range(windows):
            t0 = time.perf_counter()
            conn.request("POST", f"/v1/sessions/{sid}/audio", body=payload,
                         headers={"Content-Type": "application/octet-stream"})
            r = conn.getresponse()
            data = r.read()
            assert r.status == 200, (r.status, data[:200])
            lat.append((time.perf_counter() - t0) * 1e3)
        t_end = time.perf_counter()
        conn.request("DELETE", f"/v1/sessions/{sid}")
        conn.getresponse().read()
        conn.close()
        results.append((lat, t_begin, t_end))
    except BaseException:
        barrier.abort()  # release lockstep peers instead of hanging the run
        raise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, nargs="*", default=[1, 4, 8, 16])
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--precision", default="int8",
                    choices=["exact", "fast", "int8"])
    args = ap.parse_args()

    if args.precision != "exact":
        os.environ["ARTALK_AR_PRECISION"] = args.precision
        os.environ["ARTALK_AR_FUSED"] = "1"

    import numpy as np

    from artalk_tpu.server import MotionServer

    cap = max(args.clients)
    server = MotionServer(capacity=cap, max_sessions=cap)
    port = server.start(port=0)
    ws = server.pool.window_samples
    print(f"server up on :{port}  capacity={cap}  precision={args.precision}\n")

    for n in args.clients:
        results: list = []
        barrier = threading.Barrier(n)
        threads = [threading.Thread(
            target=client_loop,
            args=(port, args.windows, ws, 100 + i, results, barrier))
            for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        lats = np.concatenate([r[0] for r in results])
        # saturated wall: barrier release (min timed-phase start) to last
        # client's last response — warmup/compile excluded
        wall = max(r[2] for r in results) - min(r[1] for r in results)
        total = n * args.windows
        p50, p90 = np.percentile(lats, [50, 90])
        sw_s = total / wall  # session-windows per second (saturated)
        print(f"N={n:3d}  chunk p50 {p50:7.1f} ms  p90 {p90:7.1f} ms  "
              f"throughput {sw_s:6.1f} windows/s  "
              f"~{sw_s * 4.0:6.0f} RT streams sustainable  "
              f"(p50-bound RT sessions at this N: {n * 4000.0 / p50:6.0f})")

    server.close()


if __name__ == "__main__":
    main()
