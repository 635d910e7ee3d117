"""Micro WSGI framework (Flask replacement, stdlib only).

Provides the pieces the reference app uses from Flask (ref ``app.py``):
routing with path params, JSON request/response helpers, multipart form
uploads, signed-cookie sessions, ``login_required`` (401 JSON for /api/
paths, redirect otherwise — ref ``app.py:379-394``), global error handlers
returning JSON (ref ``app.py:3930-3963``), and static file serving.
"""
from __future__ import annotations

import hashlib
import hmac
import http.cookies
import io
import json
import mimetypes
import os
import re
import traceback
import urllib.parse
from email.parser import BytesParser
from email.policy import HTTP
from typing import Any, Callable, Dict, List, Optional, Tuple


class Request:
    def __init__(self, environ: dict, app: "App"):
        self.environ = environ
        self.app = app
        self.method = environ.get("REQUEST_METHOD", "GET").upper()
        self.path = environ.get("PATH_INFO", "/")
        self.query = urllib.parse.parse_qs(environ.get("QUERY_STRING", ""))
        self._body: Optional[bytes] = None
        self._json: Any = None
        self._form: Optional[Dict[str, Any]] = None
        self._files: Optional[Dict[str, "Upload"]] = None
        self.session = app._load_session(environ)

    # --- body parsing ------------------------------------------------------
    @property
    def body(self) -> bytes:
        if self._body is None:
            try:
                length = int(self.environ.get("CONTENT_LENGTH") or 0)
            except ValueError:
                length = 0
            # reject BEFORE reading: per-file checks in the handlers run
            # only after the whole body is resident — an attacker-declared
            # multi-GB Content-Length must not be read into memory
            limit = getattr(self.app, "max_content_length", None)
            if limit and length > limit:
                raise HTTPError(413, "Request body too large")
            self._body = (self.environ["wsgi.input"].read(length)
                          if length else b"")
        return self._body

    @property
    def content_type(self) -> str:
        return self.environ.get("CONTENT_TYPE", "")

    @property
    def host_url(self) -> str:
        """``scheme://host`` of this request — for links that must work
        OUTSIDE the site (emails), like the reference's
        ``url_for(..., _external=True)``."""
        scheme = self.environ.get("wsgi.url_scheme", "http")
        host = (self.environ.get("HTTP_HOST")
                or self.environ.get("SERVER_NAME", "localhost"))
        return f"{scheme}://{host}"

    def get_json(self, silent: bool = True) -> Any:
        if self._json is None:
            try:
                self._json = json.loads(self.body.decode("utf-8") or "null")
            except HTTPError:
                raise              # 413 from the body-size guard
            except Exception:
                if not silent:
                    raise
                self._json = None
        return self._json

    def _parse_form(self) -> None:
        self._form, self._files = {}, {}
        ctype = self.content_type
        if ctype.startswith("application/x-www-form-urlencoded"):
            for k, v in urllib.parse.parse_qs(self.body.decode()).items():
                self._form[k] = v[0]
        elif ctype.startswith("multipart/form-data"):
            raw = (b"Content-Type: " + ctype.encode() + b"\r\n\r\n"
                   + self.body)
            msg = BytesParser(policy=HTTP).parsebytes(raw)
            for part in msg.iter_parts():
                name = part.get_param("name", header="content-disposition")
                filename = part.get_filename()
                payload = part.get_payload(decode=True) or b""
                if filename:
                    self._files[name] = Upload(filename, payload)
                else:
                    self._form[name] = payload.decode("utf-8", "replace")

    @property
    def form(self) -> Dict[str, str]:
        if self._form is None:
            self._parse_form()
        return self._form

    @property
    def files(self) -> Dict[str, "Upload"]:
        if self._files is None:
            self._parse_form()
        return self._files

    @property
    def remote_addr(self) -> str:
        return self.environ.get("REMOTE_ADDR", "")


class Upload:
    def __init__(self, filename: str, data: bytes):
        self.filename = filename
        self.data = data
        self.stream = io.BytesIO(data)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.data)

    def read(self) -> bytes:
        return self.data


class Response:
    def __init__(self, body: Any = b"", status: int = 200,
                 headers: Optional[List[Tuple[str, str]]] = None,
                 content_type: str = "text/html; charset=utf-8"):
        if isinstance(body, str):
            body = body.encode("utf-8")
        self.body = body
        self.status = status
        self.headers = headers or []
        self.content_type = content_type


def jsonify(data: Any, status: int = 200) -> Response:
    return Response(json.dumps(data), status=status,
                    content_type="application/json")


def redirect(location: str, status: int = 302) -> Response:
    return Response(b"", status=status, headers=[("Location", location)])


_STATUS = {200: "200 OK", 201: "201 Created", 302: "302 Found",
           400: "400 Bad Request", 401: "401 Unauthorized",
           403: "403 Forbidden", 404: "404 Not Found",
           405: "405 Method Not Allowed", 413: "413 Payload Too Large",
           500: "500 Internal Server Error"}


class App:
    """WSGI application with Flask-like routing."""

    def __init__(self, secret_key: str, static_dir: Optional[str] = None,
                 static_url: str = "/static/",
                 max_content_length: int = 64 * 1024 * 1024):
        #: request bodies above this are rejected with 413 before being
        #: read (50 MB per-file cap + multipart overhead headroom)
        self.max_content_length = max_content_length
        self.secret_key = secret_key.encode()
        self.routes: List[Tuple[re.Pattern, List[str], Callable]] = []
        self.static_dir = static_dir
        self.static_url = static_url
        self.error_handler: Optional[Callable] = None
        #: status → HTML page body; browser (Accept: text/html) requests
        #: outside /api/ get these instead of the JSON error handlers
        #: (ref templates/404.html + 500.html, wired per VERDICT r1)
        self.error_pages: Dict[int, str] = {}

    def _error_response(self, req: "Request", status: int,
                        message: str) -> "Response":
        page = self.error_pages.get(status)
        wants_html = ("text/html" in req.environ.get("HTTP_ACCEPT", "")
                      and not req.path.startswith("/api/"))
        if page is not None and wants_html:
            return Response(page, status=status)
        return jsonify({"error": message}, status=status)

    # --- routing -----------------------------------------------------------
    def route(self, rule: str, methods: Optional[List[str]] = None):
        methods = [m.upper() for m in (methods or ["GET"])]
        # literal segments are regex-escaped ('/Contact.html' must not
        # match '/ContactXhtml'); <param> placeholders become groups
        parts = re.split(r"<([a-zA-Z_][a-zA-Z0-9_]*)>", rule)
        pattern = "".join(
            f"(?P<{p}>[^/]+)" if i % 2 else re.escape(p)
            for i, p in enumerate(parts))
        compiled = re.compile(f"^{pattern}$")

        def deco(fn):
            self.routes.append((compiled, methods, fn))
            return fn

        return deco

    # --- sessions (HMAC-signed cookie) -------------------------------------
    def _sign(self, payload: bytes) -> str:
        sig = hmac.new(self.secret_key, payload, hashlib.sha256).hexdigest()
        import base64

        return base64.urlsafe_b64encode(payload).decode() + "." + sig

    def _load_session(self, environ: dict) -> Dict[str, Any]:
        cookie = http.cookies.SimpleCookie(environ.get("HTTP_COOKIE", ""))
        raw = cookie.get("session")
        if not raw:
            return {}
        try:
            import base64

            payload_b64, sig = raw.value.rsplit(".", 1)
            payload = base64.urlsafe_b64decode(payload_b64.encode())
            expect = hmac.new(self.secret_key, payload,
                              hashlib.sha256).hexdigest()
            if hmac.compare_digest(sig, expect):
                return json.loads(payload)
        except Exception:
            pass
        return {}

    def _session_cookie(self, session: Dict[str, Any]) -> str:
        token = self._sign(json.dumps(session, sort_keys=True).encode())
        # SameSite=Lax: the session cookie never rides cross-site POSTs,
        # closing CSRF on the state-changing JSON routes (top-level GET
        # navigations still carry it, so email verify links keep working)
        return f"session={token}; Path=/; HttpOnly; SameSite=Lax"

    # --- WSGI --------------------------------------------------------------
    def __call__(self, environ, start_response):
        req = Request(environ, self)
        session_before = json.dumps(req.session, sort_keys=True)
        try:
            resp = self._dispatch(req)
        except HTTPError as e:
            resp = self._error_response(req, e.status, e.message)
        except Exception as e:  # global 500 handler (ref app.py:3930-3940)
            traceback.print_exc()
            if self.error_handler:
                resp = self.error_handler(req, e)
            else:
                resp = self._error_response(req, 500, str(e))
        if not isinstance(resp, Response):
            if isinstance(resp, tuple):
                resp = jsonify(resp[0], status=resp[1])
            elif isinstance(resp, (dict, list)):
                resp = jsonify(resp)
            else:
                resp = Response(resp)
        headers = [("Content-Type", resp.content_type),
                   ("Content-Length", str(len(resp.body)))] + resp.headers
        if json.dumps(req.session, sort_keys=True) != session_before:
            headers.append(("Set-Cookie", self._session_cookie(req.session)))
        start_response(_STATUS.get(resp.status, f"{resp.status} Unknown"),
                       headers)
        return [resp.body]

    def _dispatch(self, req: Request) -> Response:
        if self.static_dir and req.path.startswith(self.static_url):
            return self._serve_static(req.path[len(self.static_url):])
        path_matched = False
        for pattern, methods, fn in self.routes:
            m = pattern.match(req.path)
            if m:
                if req.method not in methods:
                    path_matched = True   # some other verb serves it
                    continue
                return fn(req, **m.groupdict())
        if path_matched:
            return self._error_response(req, 405, "Method not allowed")
        return self._error_response(
            req, 404, "The requested resource was not found")

    def _serve_static(self, rel: str) -> Response:
        safe = os.path.normpath(rel).lstrip("/")
        if ".." in safe.split(os.sep):
            return jsonify({"error": "Forbidden"}, status=403)
        fp = os.path.join(self.static_dir, safe)
        if not os.path.isfile(fp):
            return jsonify({"error": "Not found"}, status=404)
        ctype = mimetypes.guess_type(fp)[0] or "application/octet-stream"
        with open(fp, "rb") as f:
            return Response(f.read(), content_type=ctype)


class HTTPError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def login_required(fn):
    """ref ``app.py:379-394``: 401 JSON for API paths, redirect otherwise."""

    def wrapper(req: Request, *a, **kw):
        if not req.session.get("user_id") and not req.session.get("admin_id"):
            if req.path.startswith("/api/") or req.path in ("/predict",):
                return jsonify({"error": "Authentication required",
                                "authenticated": False}, status=401)
            return redirect("/")
        return fn(req, *a, **kw)

    wrapper.__name__ = fn.__name__
    return wrapper


# ---------------------------------------------------------------------------
# WSGI servers.  The reference runs Flask's threaded dev server
# (``app.run(debug=True)``, ref ``app.py:3926-3927``); the stdlib
# ``wsgiref.simple_server`` default is single-threaded, which would both
# serialize requests behind one slow upload AND starve the micro-batcher
# (serving/inference.py) of the co-arriving requests it exists to batch.
# ---------------------------------------------------------------------------
def make_threaded_server(host: str, port: int, app: "App",
                         reuse_port: bool = False):
    """A threaded WSGI server; ``reuse_port=True`` sets SO_REUSEPORT so
    several worker PROCESSES can bind the same port and let the kernel
    load-balance accepted connections across them (serving/pool.py)."""
    import socket
    import socketserver
    from wsgiref.simple_server import WSGIServer, make_server

    class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
        daemon_threads = True
        allow_reuse_address = True

        def server_bind(self):
            if reuse_port:
                self.socket.setsockopt(socket.SOL_SOCKET,
                                       socket.SO_REUSEPORT, 1)
            super().server_bind()

    return make_server(host, port, app, server_class=ThreadingWSGIServer)
