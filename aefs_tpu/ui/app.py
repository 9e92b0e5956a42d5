"""Frontend server: stdlib HTTP server for the control-plane UI.

The reference frontend is a Dash app (app.py) + Plotly; neither is in this
image, so the control plane is a static single-page app (ui/assets/) served
by ``http.server``, talking the same WebSocket protocol to the backend.
Effect defaults, slider specs, and factory presets are injected from
core/config.py via /config.json so UI and engine can't drift apart
(the reference duplicates these between app.py:6-39 and the effect
constructors; SURVEY.md §5 notes UI defaults != constructor defaults).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import ThreadingHTTPServer, SimpleHTTPRequestHandler

from aefs_tpu.core.config import (
    EFFECT_DEFAULTS,
    DEFAULT_PRESETS,
    UI_CONTROLS,
    STATIC_UI_PARAMS,
)

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "assets")


def config_payload():
    return {
        "effect_defaults": EFFECT_DEFAULTS,
        "default_presets": DEFAULT_PRESETS,
        "ui_controls": UI_CONTROLS,
        "static_params": STATIC_UI_PARAMS,
        "ws_port": int(os.environ.get("BACKEND_PORT", 8765)),
    }


class Handler(SimpleHTTPRequestHandler):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, directory=ASSETS_DIR, **kwargs)

    def do_GET(self):
        if self.path.split("?")[0] == "/config.json":
            body = json.dumps(config_payload()).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path == "/":
            self.path = "/index.html"
        return super().do_GET()

    def log_message(self, fmt, *args):  # quiet
        pass


def serve(port=8050, blocking=True):
    # Threading: a single stalled client connection must not block
    # index.html/assets/config.json for every other tab.
    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"UI server on http://0.0.0.0:{port}")
    if blocking:
        httpd.serve_forever()
    else:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
    return httpd


if __name__ == "__main__":
    serve(int(os.environ.get("UI_PORT", 8050)))
