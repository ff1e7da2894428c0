"""GCSStore tests against an in-process GCS JSON-API emulator
(STORAGE_EMULATOR_HOST) — exercises the real google-cloud-storage client
paths (download_as_bytes, list_blobs, exists) with zero network egress."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

pytest.importorskip("google.cloud.storage")

BLOBS = {
    "Data_Entry_2017.csv": b"Image Index,Finding Labels\na.png,Mass\n",
    "images_001/images/a.png": b"PNGBYTES-A",
    "images_001/images/b.png": b"PNGBYTES-B",
    "images_002/images/c.png": b"PNGBYTES-C",
}
BUCKET = "fake-bucket"


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def _send(self, code, body: bytes, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(parsed.query)
        path = parsed.path
        # media download
        if path.startswith(f"/download/storage/v1/b/{BUCKET}/o/"):
            name = urllib.parse.unquote(
                path.split(f"/b/{BUCKET}/o/", 1)[1])
            if name in BLOBS:
                return self._send(200, BLOBS[name],
                                  "application/octet-stream")
            return self._send(404, b'{"error": {"code": 404}}')
        # list
        if path == f"/storage/v1/b/{BUCKET}/o":
            prefix = qs.get("prefix", [""])[0]
            items = [{"name": n, "bucket": BUCKET, "size": str(len(v))}
                     for n, v in sorted(BLOBS.items())
                     if n.startswith(prefix)]
            return self._send(200, json.dumps({"items": items}).encode())
        # metadata (exists / reload before download in some versions)
        if path.startswith(f"/storage/v1/b/{BUCKET}/o/"):
            name = urllib.parse.unquote(
                path.split(f"/b/{BUCKET}/o/", 1)[1])
            if name in BLOBS:
                return self._send(200, json.dumps(
                    {"name": name, "bucket": BUCKET,
                     "size": str(len(BLOBS[name]))}).encode())
            return self._send(404, b'{"error": {"code": 404}}')
        if path.startswith(f"/storage/v1/b/{BUCKET}"):
            return self._send(200, json.dumps({"name": BUCKET}).encode())
        return self._send(404, b'{"error": {"code": 404}}')


@pytest.fixture(scope="module")
def emulator(request):
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host = f"http://127.0.0.1:{server.server_port}"
    import os
    old = os.environ.get("STORAGE_EMULATOR_HOST")
    os.environ["STORAGE_EMULATOR_HOST"] = host
    yield host
    if old is None:
        os.environ.pop("STORAGE_EMULATOR_HOST", None)
    else:
        os.environ["STORAGE_EMULATOR_HOST"] = old
    server.shutdown()


def test_gcs_store_get_list_exists(emulator):
    from chestxray_vit_tpu.data.storage import GCSStore
    store = GCSStore(BUCKET)
    assert store.get("Data_Entry_2017.csv").startswith(b"Image Index")
    assert store.get("images_001/images/a.png") == b"PNGBYTES-A"
    names = store.list("images_001/images/")
    assert names == ["images_001/images/a.png", "images_001/images/b.png"]
    assert store.exists("images_002/images/c.png")
    assert not store.exists("images_002/images/missing.png")


def test_gcs_blob_map_and_loader(emulator):
    from chestxray_vit_tpu.config import DataConfig
    from chestxray_vit_tpu.data.storage import GCSStore, build_blob_map
    store = GCSStore(BUCKET)
    cfg = DataConfig(backend="gcs", gcs_bucket_name=BUCKET,
                     num_image_folders=3)
    blob_map = build_blob_map(store, cfg)
    assert blob_map == {
        "a.png": "images_001/images/a.png",
        "b.png": "images_001/images/b.png",
        "c.png": "images_002/images/c.png",
    }


def test_gcs_store_shared_client_across_threads(emulator):
    """The reference created a client per sample (pyc L272); ours is one
    shared client and must be thread-safe."""
    from concurrent.futures import ThreadPoolExecutor
    from chestxray_vit_tpu.data.storage import GCSStore
    store = GCSStore(BUCKET)
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(
            lambda _: store.get("images_001/images/a.png"), range(32)))
    assert all(r == b"PNGBYTES-A" for r in results)
