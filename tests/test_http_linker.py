"""Entry point C parity: fetch a schema over live HTTP, transitively link
its remote $refs, compile, validate — modeled on the reference's HTTP
integration tests (test/test-http.js + test/remotes fixtures: a simple
string-array schema with a $ref, and a jcard-style schema with oneOf +
tuple items)."""

import http.server
import json
import threading

import pytest

from schema_fantasy_spark.compiler.http import engine_from_url, load_schema
from schema_fantasy_spark.compiler.plan import compile_schema

# fixture universe, same shape as reference test/remotes/simple + jcard
DOCS = {
    "/simple/array": {
        "id": "http://HOST/simple/array",
        "type": "array",
        "items": {"$ref": "item"},
    },
    "/simple/item": {"type": "string", "minLength": 2},
    "/jcard/card": {
        "id": "http://HOST/jcard/card",
        "type": "array",
        "items": [{"enum": ["vcard"]}, {"type": "array", "items": {"$ref": "property"}}],
    },
    "/jcard/property": {
        "type": "array",
        "items": [{"type": "string"}, {"type": "object"}],
        "minItems": 2,
    },
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        doc = DOCS.get(self.path)
        if doc is None:
            self.send_response(404)
            self.end_headers()
            return
        host = self.headers.get("Host")
        body = json.dumps(doc).replace("HOST", host).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_load_schema_links_transitively(server):
    schema, refs = load_schema(f"{server}/simple/array")
    assert schema["type"] == "array"
    assert f"{server}/simple/array" in refs and f"{server}/simple/item" in refs
    compiled = compile_schema(schema, refs=refs, base=f"{server}/simple/array")
    assert compiled.is_valid(["ab", "cde"])
    assert not compiled.is_valid(["ab", 3])
    assert not compiled.is_valid(["a"])  # minLength from the remote item


def test_jcard_style_tuple_items(server):
    schema, refs = load_schema(f"{server}/jcard/card")
    compiled = compile_schema(schema, refs=refs, base=f"{server}/jcard/card")
    assert compiled.is_valid(["vcard", [["fn", {}], ["org", {"x": 1}]]])
    assert not compiled.is_valid(["notvcard", []])
    assert not compiled.is_valid(["vcard", [["fn"]]])  # property minItems 2


def test_engine_from_url_end_to_end(server, spark):
    eng = engine_from_url(f"{server}/simple/item", mode="dynamic")
    df = spark.createDataFrame([('"ok"',), ('"x"',), ("5",)], "doc: string")
    got = [r["verdict"] for r in eng.apply(df, doc_col="doc").collect()]
    assert got == [True, False, False]


def test_unknown_remote_404(server):
    from urllib.error import HTTPError

    with pytest.raises(HTTPError):
        load_schema(f"{server}/nope")
