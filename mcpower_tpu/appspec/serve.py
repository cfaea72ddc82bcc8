"""Local GUI host: a stdlib HTTP server over the AppSpec driver boundary.

The tpu-native counterpart of the reference's desktop-app shell
(``/root/reference/ports/app/src-tauri`` — a Tauri webview whose Rust
backend invokes engine-app-spec's ``run_find_power`` /
``run_find_sample_size`` over IPC, ``crates/engine-app-spec/src/driver.rs``):
here the shell is the user's browser, the IPC is loopback HTTP, and the
backend verbs are the SAME two AppSpec driver operations the CLI host
exposes. The GUI page (``static/app.html``) owns all widget state and
builds the tagged AppSpec JSON document; this module only ever sees
documents at the same boundary every other host uses — no widget state,
no engine types.

Endpoints (all JSON):

* ``GET  /``            — the single-file GUI page.
* ``GET  /api/health``  — ``{"ok": true, "version": ...}``.
* ``POST /api/run``     — ``{"spec": <AppSpec doc>, "sample_size": N}`` ->
  the driver payload ``{"result", "plots", "summary"}``.
* ``POST /api/search``  — ``{"spec": ..., "from_size"?, "to_size"?, "by"?}``
  -> the same payload shape for the sample-size search.
* ``POST /api/merge``   — ``{"parts": [<run payloads>...]}`` -> one pooled
  payload. Run/search additionally accept ``n_sims`` + ``sim_offset``, so a
  pooling host (the GUI page's worker fan-out, or several serve processes
  on different machines) runs disjoint sim-id ranges of one seed and pools
  them exactly — the reference browser pool's split/merge protocol
  (ports/wasm/src/index.ts, seeds.ts) over HTTP instead of postMessage.

Structural errors come back as ``400 {"error": {"path", "message"}}``
(:class:`AppSpecError` keeps its field path); engine/validation errors as
``400`` with the message; anything else is a 500. The server binds
loopback only by default — it is a local application shell, not a service.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

from .types import AppSpecError

_STATIC = Path(__file__).parent / "static"
_MAX_BODY = 64 * 1024 * 1024  # uploaded CSV columns ride inside the doc

# One engine run per LOCAL DEVICE instead of one per process: part requests
# draw a device from this slot queue and dispatch under
# ``jax.default_device(dev)`` (JAX config context managers are thread-local,
# so concurrent handler threads drive different chips — a TPU pod-slice VM
# exposes each chip as one ``jax.local_device``). A single-device host
# degenerates to the previous one-run-at-a-time lock. The reference's
# browser pool gets its concurrency from one wasm engine per WebWorker
# (ports/wasm/src/index.ts); here the equivalent unit is one chip per part.
_SLOTS: Optional["queue.Queue"] = None
_SLOTS_INIT = threading.Lock()
# Longest a part request queues for a device before 503: long enough to ride
# out a typical engine run ahead of it, short enough that abandoned clients
# don't claim chips minutes later.
_SLOT_WAIT_S = 120.0


def _device_slots() -> "queue.Queue":
    global _SLOTS
    with _SLOTS_INIT:
        if _SLOTS is None:
            import jax

            q: "queue.Queue" = queue.Queue()
            for d in jax.local_devices():
                q.put(d)
            _SLOTS = q
    return _SLOTS


def _payload_for(body: Dict[str, Any]) -> Tuple[str, Dict[str, Any]]:
    """Dispatch one API request body to the matching driver verb."""
    from .driver import run_find_power, run_find_sample_size

    if "spec" not in body:
        raise AppSpecError("$.spec", "required field missing")

    def _opt_int(key: str, minimum: int = 1) -> Optional[int]:
        v = body.get(key)
        if v is None:
            return None
        if not isinstance(v, int) or isinstance(v, bool) or v < minimum:
            raise AppSpecError(f"$.{key}", f"expected an integer >= {minimum}")
        return v

    # Worker-pool knobs (both verbs): a pooled host runs disjoint
    # [sim_offset, sim_offset + n_sims) ranges of one seed and pools the
    # part payloads with /api/merge.
    n_sims = _opt_int("n_sims")
    sim_offset = _opt_int("sim_offset", minimum=0) or 0

    if "sample_size" in body:
        n = body["sample_size"]
        if not isinstance(n, int) or isinstance(n, bool) or n <= 0:
            raise AppSpecError("$.sample_size", "expected a positive integer")
        return "run", run_find_power(
            body["spec"], n, n_sims=n_sims, sim_id_offset=sim_offset
        )

    return "search", run_find_sample_size(
        body["spec"],
        from_size=_opt_int("from_size"),
        to_size=_opt_int("to_size"),
        by=body.get("by"),
        n_sims=n_sims,
        sim_id_offset=sim_offset,
    )


class _Handler(BaseHTTPRequestHandler):
    server_version = "mcpower-tpu-app"

    def _send(self, code: int, payload: Dict[str, Any], ctype="application/json"):
        data = (
            json.dumps(payload).encode()
            if ctype == "application/json"
            else payload
        )
        self.send_response(code)
        self.send_header("Content-Type", ctype + "; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        # Loopback app shell: forbid any cross-origin embedding/reads.
        self.send_header("X-Content-Type-Options", "nosniff")
        self.send_header("Referrer-Policy", "no-referrer")
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt, *args):  # quiet by default; errors still raise
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            page = (_STATIC / "app.html").read_bytes()
            self._send(200, page, ctype="text/html")
        elif self.path == "/api/health":
            self._send(200, {"ok": True, "host": "mcpower_tpu appspec serve"})
        else:
            self._send(404, {"error": {"message": f"no route {self.path}"}})

    def _origin_ok(self, origin: str) -> bool:
        try:
            from urllib.parse import urlsplit

            parts = urlsplit(origin)
        except ValueError:
            return False
        if parts.scheme not in ("http", "https"):
            return False
        if parts.hostname not in ("127.0.0.1", "localhost", "::1"):
            return False
        try:
            port = parts.port
        except ValueError:
            return False
        if port is None:
            port = 443 if parts.scheme == "https" else 80
        return port == self.server.server_address[1]

    def do_POST(self):
        if self.path not in ("/api/run", "/api/search", "/api/merge"):
            self._send(404, {"error": {"message": f"no route {self.path}"}})
            return
        # A non-local page can fire cross-origin POSTs at loopback (it
        # cannot read the response, but it could drive engine runs) —
        # accept only same-origin/absent Origin headers. Same-origin means
        # scheme + loopback host + THIS server's port: a page served by
        # any other local listener (a dev server on :3000) is still
        # cross-origin.
        origin = self.headers.get("Origin")
        if origin is not None and not self._origin_ok(origin):
            self._send(403, {"error": {"message": "cross-origin request"}})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            if not 0 < length <= _MAX_BODY:
                raise AppSpecError("$", f"body length {length} out of range")
            body = json.loads(self.rfile.read(length))
            if not isinstance(body, dict):
                raise AppSpecError("$", "expected a JSON object")
            if self.path == "/api/merge":
                from .driver import merge_run_payloads

                self._send(200, merge_run_payloads(body.get("parts")))
                return
            verb = "run" if self.path == "/api/run" else "search"
            if verb == "search" and "sample_size" in body:
                raise AppSpecError(
                    "$.sample_size", "not a /api/search field (use /api/run)"
                )
            if verb == "run" and "sample_size" not in body:
                raise AppSpecError("$.sample_size", "required field missing")
            slots = _device_slots()
            # Bounded wait: a client that gave up must not consume a chip
            # later when its handler thread finally wins a slot — saturation
            # past the wait window is the pool's signal to retry/back off.
            try:
                dev = slots.get(timeout=_SLOT_WAIT_S)
            except queue.Empty:
                self._send(
                    503,
                    {"error": {"message": "all devices busy; retry later"}},
                )
                return
            try:
                import jax

                with jax.default_device(dev):
                    _, payload = _payload_for(body)
            finally:
                slots.put(dev)
            # Host provenance (NOT pool identity — that is part_meta's job):
            # lets a fan-out page or a test see which chip served each part.
            payload["host"] = {"device": str(dev), "platform": dev.platform}
            self._send(200, payload)
        except AppSpecError as e:
            self._send(400, {"error": {"path": e.path, "message": e.reason}})
        except (ValueError, KeyError) as e:
            self._send(400, {"error": {"message": str(e)}})
        except Exception as e:  # engine/internal
            self._send(500, {"error": {"message": f"{type(e).__name__}: {e}"}})


def make_server(host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (without running) the app server; port 0 = ephemeral."""
    return ThreadingHTTPServer((host, port), _Handler)


def serve(host: str = "127.0.0.1", port: int = 8321, *, open_browser=True,
          verbose=True) -> None:
    """Run the GUI host until interrupted."""
    httpd = make_server(host, port)
    httpd.verbose = verbose
    url = f"http://{host}:{httpd.server_address[1]}/"
    if verbose:
        print(f"MCPower app at {url}  (Ctrl-C to stop)")
    if open_browser:
        import webbrowser

        threading.Timer(0.3, webbrowser.open, (url,)).start()
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
