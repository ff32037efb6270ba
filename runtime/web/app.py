#!/usr/bin/env python3
"""Web microphone demo launcher (capability parity with the reference's
`runtime/web/app.py` gradio demo, dependency-free).

Serves the static mic-capture page (index.html) over HTTP and, unless
--ws_url points at an already-running server, spawns the C++
websocket_server_main for it to talk to.

  python runtime/web/app.py --model_dir exp/export --port 8080 \
      [--ws_port 10086] [--runtime_build runtime/build]

The model dir must contain train.yaml, final.ckpt, units.txt (the C API
model-dir contract).
"""

import argparse
import http.server
import os
import shlex
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--ws_port", type=int, default=10086)
    parser.add_argument("--ws_url", default=None,
                        help="use an existing websocket server instead of "
                             "spawning one")
    parser.add_argument("--model_dir", default=None)
    parser.add_argument("--runtime_build", default="runtime/build")
    parser.add_argument("--chunk_size", type=int, default=16)
    args = parser.parse_args()

    web_dir = os.path.dirname(os.path.abspath(__file__))
    server_proc = None
    if args.ws_url is None and args.model_dir:
        model_dir = os.path.abspath(args.model_dir)
        binary = os.path.join(args.runtime_build, "websocket_server_main")
        num_bins = "80"
        yaml_path = os.path.join(model_dir, "train.yaml")
        if os.path.exists(yaml_path):
            for line in open(yaml_path):
                if "num_mel_bins" in line:
                    num_bins = line.split(":")[-1].strip()
                    break
        worker = (f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
                  f"--config {model_dir}/train.yaml "
                  f"--checkpoint {model_dir}/final.ckpt "
                  f"--chunk_size {args.chunk_size}")
        cmd = [binary, "--port", str(args.ws_port),
               "--symbol_table", os.path.join(model_dir, "units.txt"),
               "--worker_cmd", worker,
               "--chunk_size", str(args.chunk_size),
               "--num_bins", num_bins]
        print("spawning:", " ".join(shlex.quote(c) for c in cmd))
        server_proc = subprocess.Popen(cmd)

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=web_dir, **kw)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                with open(os.path.join(web_dir, "index.html"), "rb") as f:
                    body = f.read()
                # Inject the websocket port so the page needs no config.
                inj = (f"<script>window.WS_PORT={args.ws_port};"
                       f"</script>").encode()
                body = body.replace(b"<script>", inj + b"<script>", 1)
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                super().do_GET()

    httpd = http.server.ThreadingHTTPServer(("", args.port), Handler)
    print(f"web demo at http://localhost:{args.port}/ "
          f"(websocket on {args.ws_url or args.ws_port})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if server_proc:
            server_proc.terminate()


if __name__ == "__main__":
    main()
