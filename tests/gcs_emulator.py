"""In-process GCS JSON-API emulator for zero-egress tests.

Serves enough of the JSON API for all three gs:// clients this framework
touches:

- ``google-cloud-storage`` (data/storage.GCSStore): media download, list,
  metadata GET — honors ``STORAGE_EMULATOR_HOST``;
- ``gcsfs`` (etils epath's fsspec backend, used by Orbax for directory
  ops/metadata when ``EPATH_USE_TF=0``): delimiter listing, multipart +
  resumable uploads, DELETE, batch delete — honors
  ``STORAGE_EMULATOR_HOST``;
- ``tensorstore`` (Orbax array storage): resumable/one-shot uploads,
  ranged reads — honors ``TENSORSTORE_GCS_HTTP_URL``.

State is a plain dict {blob_name: bytes} per bucket, exposed for seeding
and assertions.
"""

from __future__ import annotations

import email.parser
import json
import re
import threading
import time
import urllib.parse
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple


class GCSEmulator:
    """Threaded HTTP server emulating the GCS JSON API on 127.0.0.1."""

    def __init__(self, buckets: Optional[Dict[str, Dict[str, bytes]]] = None):
        self.buckets: Dict[str, Dict[str, bytes]] = buckets or {}
        self.lock = threading.Lock()
        self.sessions: Dict[str, Tuple[str, str, bytearray]] = {}
        emulator = self

        class Handler(_Handler):
            em = emulator

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> str:
        self._thread.start()
        return self.url

    def stop(self) -> None:
        self._server.shutdown()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self._server.server_port}"

    def bucket(self, name: str) -> Dict[str, bytes]:
        return self.buckets.setdefault(name, {})


def _obj_meta(bucket: str, name: str, data: bytes) -> dict:
    now = time.strftime("%Y-%m-%dT%H:%M:%S.000Z", time.gmtime())
    return {
        "kind": "storage#object",
        "id": f"{bucket}/{name}/1",
        "name": name,
        "bucket": bucket,
        "generation": "1",
        "metageneration": "1",
        "size": str(len(data)),
        "timeCreated": now,
        "updated": now,
        "storageClass": "STANDARD",
        "contentType": "application/octet-stream",
        "crc32c": "AAAAAA==",
        "md5Hash": "",
    }


class _Handler(BaseHTTPRequestHandler):
    em: GCSEmulator
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # silence
        pass

    # -- helpers -----------------------------------------------------------

    def _send(self, code: int, body: bytes = b"",
              ctype: str = "application/json", headers: dict = None):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _json(self, code: int, obj: dict, headers: dict = None):
        self._send(code, json.dumps(obj).encode(), headers=headers)

    def _error(self, code: int, message: str = ""):
        self._json(code, {"error": {"code": code, "message": message,
                                    "errors": [{"reason": "notFound"
                                                if code == 404 else "error",
                                                "message": message}]}})

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _route(self) -> Tuple[str, dict]:
        parsed = urllib.parse.urlparse(self.path)
        qs = {k: v[0] for k, v in
              urllib.parse.parse_qs(parsed.query).items()}
        return parsed.path, qs

    # -- GET: download / metadata / list ----------------------------------

    def do_GET(self):
        path, qs = self._route()
        m = re.match(r"^/download/storage/v1/b/([^/]+)/o/(.*)$", path)
        if m:
            return self._download(m.group(1),
                                  urllib.parse.unquote(m.group(2)))
        m = re.match(r"^/storage/v1/b/([^/]+)/o/(.*)$", path)
        if m:
            bucket, name = m.group(1), urllib.parse.unquote(m.group(2))
            if qs.get("alt") == "media":
                return self._download(bucket, name)   # takes the lock itself
            with self.em.lock:
                blobs = self.em.buckets.get(bucket, {})
                if name not in blobs:
                    return self._error(404, f"No such object: {name}")
                return self._json(200, _obj_meta(bucket, name, blobs[name]))
        m = re.match(r"^/storage/v1/b/([^/]+)/o/?$", path)
        if m:
            return self._list(m.group(1), qs)
        m = re.match(r"^/storage/v1/b/([^/]+)/?$", path)
        if m:
            name = m.group(1)
            if name in self.em.buckets:
                return self._json(200, {"kind": "storage#bucket",
                                        "id": name, "name": name})
            return self._error(404, f"No such bucket: {name}")
        return self._error(404, f"unhandled GET {path}")

    def _download(self, bucket: str, name: str):
        with self.em.lock:
            blobs = self.em.buckets.get(bucket, {})
            if name not in blobs:
                return self._error(404, f"No such object: {name}")
            data = blobs[name]
        rng = self.headers.get("Range")
        if rng:
            m = re.match(r"bytes=(\d+)-(\d*)", rng)
            if m:
                start = int(m.group(1))
                stop = int(m.group(2)) + 1 if m.group(2) else len(data)
                chunk = data[start:stop]
                return self._send(
                    206, chunk, "application/octet-stream",
                    {"Content-Range":
                     f"bytes {start}-{start + len(chunk) - 1}/{len(data)}"})
        return self._send(200, data, "application/octet-stream")

    def _list(self, bucket: str, qs: dict):
        prefix = qs.get("prefix", "")
        delimiter = qs.get("delimiter")
        with self.em.lock:
            blobs = dict(self.em.buckets.get(bucket, {}))
        items, prefixes = [], set()
        for name in sorted(blobs):
            if not name.startswith(prefix):
                continue
            rest = name[len(prefix):]
            if delimiter and delimiter in rest:
                prefixes.add(prefix + rest.split(delimiter, 1)[0]
                             + delimiter)
            else:
                items.append(_obj_meta(bucket, name, blobs[name]))
        out = {"kind": "storage#objects", "items": items}
        if delimiter:
            out["prefixes"] = sorted(prefixes)
        return self._json(200, out)

    # -- uploads -----------------------------------------------------------

    def do_POST(self):
        path, qs = self._route()
        if path == "/batch/storage/v1":
            return self._batch()
        m = re.match(r"^/(?:upload/)?storage/v1/b/([^/]+)/o/?$", path)
        if m:
            bucket = m.group(1)
            upload_type = qs.get("uploadType", "")
            if "upload_id" in qs:
                # gcsfs pushes resumable chunks with POST (not PUT) to the
                # session URL — same wire semantics either way
                return self._session_chunk(qs["upload_id"])
            if upload_type == "resumable":
                return self._start_resumable(bucket, qs)
            if upload_type == "multipart":
                return self._multipart(bucket)
            if upload_type == "media":
                name = qs.get("name", "")
                data = self._body()
                with self.em.lock:
                    self.em.bucket(bucket)[name] = data
                return self._json(200, _obj_meta(bucket, name, data))
            # JSON-then-media two-phase not used by our clients
            return self._error(400, f"uploadType {upload_type!r}")
        m = re.match(
            r"^/storage/v1/b/([^/]+)/o/(.*)/(?:rewriteTo|copyTo)"
            r"/b/([^/]+)/o/(.*)$", path)
        if m:
            src_b, src = m.group(1), urllib.parse.unquote(m.group(2))
            dst_b, dst = m.group(3), urllib.parse.unquote(m.group(4))
            with self.em.lock:
                sb = self.em.buckets.get(src_b, {})
                if src not in sb:
                    return self._error(404, f"No such object: {src}")
                data = sb[src]
                self.em.bucket(dst_b)[dst] = data
            meta = _obj_meta(dst_b, dst, data)
            return self._json(200, {"kind": "storage#rewriteResponse",
                                    "done": True,
                                    "objectSize": str(len(data)),
                                    "totalBytesRewritten": str(len(data)),
                                    "resource": meta})
        return self._error(404, f"unhandled POST {path}")

    def _start_resumable(self, bucket: str, qs: dict):
        body = self._body()
        name = qs.get("name", "")
        if not name and body:
            try:
                name = json.loads(body).get("name", "")
            except ValueError:
                pass
        sid = uuid.uuid4().hex
        with self.em.lock:
            self.em.sessions[sid] = (bucket, name, bytearray())
        location = (f"{self.em.url}/upload/storage/v1/b/{bucket}/o"
                    f"?uploadType=resumable&upload_id={sid}")
        return self._send(200, b"{}", headers={"Location": location,
                                               "X-GUploader-UploadID": sid})

    def do_PUT(self):
        path, qs = self._route()
        m = re.match(r"^/upload/storage/v1/b/([^/]+)/o/?$", path)
        if m and "upload_id" in qs:
            return self._session_chunk(qs["upload_id"])
        return self._error(404, f"unhandled PUT {path}")

    def _session_chunk(self, sid: str):
        """One chunk of a resumable session (PUT from the official clients
        and tensorstore, POST from gcsfs)."""
        with self.em.lock:
            if sid not in self.em.sessions:
                return self._error(404, "no such upload session")
            bucket, name, buf = self.em.sessions[sid]
        data = self._body()
        crange = self.headers.get("Content-Range", "")
        #  bytes 0-99/100  |  bytes */100  |  bytes 0-99/*
        m2 = re.match(r"bytes (?:(\d+)-(\d+)|\*)/(\d+|\*)", crange)
        with self.em.lock:
            if sid not in self.em.sessions:
                # a retried final chunk can race its duplicate: the first
                # finalized and deleted the session while this one was
                # reading the body — report success idempotently instead
                # of double-finalizing/KeyError (clients retry on 5xx)
                obj = self.em.bucket(bucket).get(name)
                if obj is not None:
                    return self._json(200, _obj_meta(bucket, name, obj))
                return self._error(404, "no such upload session")
            if m2 and m2.group(1) is not None:
                start = int(m2.group(1))
                buf[start:start + len(data)] = data
            elif data:
                buf.extend(data)
            total = m2.group(3) if m2 else "*"
            if total != "*" and len(buf) >= int(total):
                self.em.bucket(bucket)[name] = bytes(buf)
                del self.em.sessions[sid]
                return self._json(
                    200, _obj_meta(bucket, name, bytes(buf)))
            if not crange:              # single-shot, no Content-Range
                self.em.bucket(bucket)[name] = bytes(buf)
                del self.em.sessions[sid]
                return self._json(
                    200, _obj_meta(bucket, name, bytes(buf)))
        # incomplete: 308 Resume Incomplete
        have = len(buf)
        return self._send(
            308, b"", headers={"Range": f"bytes=0-{have - 1}"}
            if have else {})

    def _multipart(self, bucket: str):
        ctype = self.headers.get("Content-Type", "")
        body = self._body()
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            return self._error(400, "missing multipart boundary")
        msg = email.parser.BytesParser().parsebytes(
            b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body)
        parts = msg.get_payload()
        if len(parts) != 2:
            return self._error(400, f"expected 2 parts, got {len(parts)}")
        meta = json.loads(parts[0].get_payload(decode=True) or b"{}")
        data = parts[1].get_payload(decode=True) or b""
        name = meta.get("name", "")
        with self.em.lock:
            self.em.bucket(bucket)[name] = data
        return self._json(200, _obj_meta(bucket, name, data))

    # -- delete ------------------------------------------------------------

    def do_DELETE(self):
        path, _ = self._route()
        m = re.match(r"^/storage/v1/b/([^/]+)/o/(.*)$", path)
        if m:
            bucket, name = m.group(1), urllib.parse.unquote(m.group(2))
            with self.em.lock:
                blobs = self.em.buckets.get(bucket, {})
                if name not in blobs:
                    return self._error(404, f"No such object: {name}")
                del blobs[name]
            return self._send(204)
        return self._error(404, f"unhandled DELETE {path}")

    # -- batch (gcsfs bulk delete) ----------------------------------------

    def _batch(self):
        ctype = self.headers.get("Content-Type", "")
        body = self._body()
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            return self._error(400, "missing batch boundary")
        boundary = m.group(1).encode()
        responses = []
        for raw in body.split(b"--" + boundary):
            raw = raw.strip()
            if not raw or raw == b"--":
                continue
            # each part: MIME headers, blank line, then an embedded HTTP
            # request (e.g. "DELETE /storage/v1/b/x/o/y HTTP/1.1")
            seg = raw.split(b"\r\n\r\n", 1)[-1]
            line = seg.split(b"\r\n", 1)[0].decode(errors="replace")
            mm = re.match(r"(DELETE|GET)\s+(\S+)", line)
            status = 400
            if mm:
                verb, target = mm.group(1), mm.group(2)
                target = urllib.parse.urlparse(target).path
                dm = re.match(r"^/storage/v1/b/([^/]+)/o/(.*)$", target)
                if dm and verb == "DELETE":
                    bucket = dm.group(1)
                    name = urllib.parse.unquote(dm.group(2))
                    with self.em.lock:
                        blobs = self.em.buckets.get(bucket, {})
                        if name in blobs:
                            del blobs[name]
                            status = 204
                        else:
                            status = 404
            responses.append(status)
        out_boundary = "batch_" + uuid.uuid4().hex
        chunks = []
        for i, status in enumerate(responses):
            chunks.append(
                f"--{out_boundary}\r\n"
                f"Content-Type: application/http\r\n"
                f"Content-ID: <response-{i + 1}>\r\n\r\n"
                f"HTTP/1.1 {status} X\r\n"
                f"Content-Length: 0\r\n\r\n")
        chunks.append(f"--{out_boundary}--\r\n")
        payload = "".join(chunks).encode()
        return self._send(200, payload,
                          f"multipart/mixed; boundary={out_boundary}")


def start_emulator(buckets: Optional[Dict[str, Dict[str, bytes]]] = None
                   ) -> GCSEmulator:
    em = GCSEmulator(buckets)
    em.start()
    return em
