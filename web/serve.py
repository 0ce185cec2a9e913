"""Dev server for the web decoder demo/tests with COOP/COEP headers
(crossOriginIsolated enables SharedArrayBuffer for the parallel decoder,
matching the reference's web/serve.json configuration).

Usage: python web/serve.py [port]
"""

from __future__ import annotations

import sys
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path


class Handler(SimpleHTTPRequestHandler):
    def end_headers(self) -> None:
        self.send_header("Cross-Origin-Opener-Policy", "same-origin")
        self.send_header("Cross-Origin-Embedder-Policy", "require-corp")
        self.send_header("Cache-Control", "no-store")
        super().end_headers()

    def log_message(self, *args) -> None:  # quiet
        pass


def main() -> int:
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8432
    handler = partial(Handler, directory=str(Path(__file__).resolve().parent))
    with ThreadingHTTPServer(("127.0.0.1", port), handler) as srv:
        print(f"serving web/ at http://127.0.0.1:{port}/")
        srv.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
