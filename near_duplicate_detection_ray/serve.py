"""Thin HTTP serving edge over the near-dup query index — completes the
reference's E3 surface (``ndd/server_ndd.py:271-315`` Flask routes +
``client_flask.py`` JSON client) with ONLY the stdlib ``http.server``; no new
dependencies, no network beyond localhost.

Routes (JSON in/out, plus one HTML demo page):

    GET  /                  -> HTML demo page (reference parity: the
                               ``client_flask.py`` upload form + results
                               table, re-expressed as a text probe — the
                               page calls POST /query via fetch and renders
                               conv_id/jaccard/containment/rank rows)
    GET  /health            -> {"ok": true, "size": N}
    GET  /size              -> {"size": N}
    POST /query             -> {"results": [...]}; body {"text": str | null,
                               "text_b64": base64-utf8 str | null, "k": int}
    POST /update            -> {"ingested": N}; body {"signatures_path": str}
    POST /evict             -> {"evicted": N}; body {"conv_ids": [str, ...]}

``text_b64`` mirrors the reference's base64 upload edge
(``server_ndd.py:280-288``, SURVEY §2 M15): the payload is decoded
server-side before probing, so binary-safe transports work unchanged.

With ``n_shards=1`` (default) the handler holds a driver-side
:class:`NearDupIndex`; with ``n_shards>1`` it holds a
:class:`ShardedNearDupIndex` — N conv-sharded ``IndexShardActor``s, the
probe signature computed once and fanned out, results merged bit-identical
to the single-index path (pytest-pinned; per-actor memory ~1/N).  Serving
is read-mostly: queries take a shared lock-free path (dict reads are atomic
under the GIL), mutations (``/update``, ``/evict``) serialize on a mutex.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .config import NDDConfig
from .pipelines.query import NearDupIndex

# Demo page (reference E3 parity: ``ndd/client_flask.py:37-55`` builds an
# HTML results table for an uploaded image; here the probe is text).  All
# result rendering uses DOM textContent — no server-side interpolation of
# user content, so the page is injection-safe by construction.
_DEMO_HTML = b"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"><title>near-dup search</title>
<style>
 body{font-family:sans-serif;max-width:56rem;margin:2rem auto;padding:0 1rem}
 textarea{width:100%;height:8rem} table{border-collapse:collapse;margin-top:1rem}
 td,th{border:1px solid #999;padding:.3rem .6rem;text-align:left}
 .err{color:#b00}
</style></head><body>
<h1>Near-duplicate search</h1>
<p>Paste a conversation (or a snippet of one) and rank its near-duplicates
in the indexed corpus.</p>
<textarea id="text" placeholder="probe text"></textarea>
<p><label>top-k <input id="k" type="number" value="30" min="1" max="500"
style="width:5rem"></label>
<button id="go">search</button> <span id="status"></span></p>
<table id="results" hidden><thead><tr><th>rank</th><th>conv_id</th>
<th>jaccard</th><th>containment</th></tr></thead><tbody></tbody></table>
<script>
const $=id=>document.getElementById(id);
$("go").onclick=async()=>{
  $("status").textContent="searching\\u2026";$("status").className="";
  try{
    const r=await fetch("/query",{method:"POST",
      headers:{"Content-Type":"application/json"},
      body:JSON.stringify({text:$("text").value,k:+$("k").value||30})});
    const data=await r.json();
    if(!r.ok)throw new Error(data.error||r.status);
    const tb=$("results").querySelector("tbody");tb.replaceChildren();
    for(const row of data.results){
      const tr=document.createElement("tr");
      for(const v of [row.rank,row.conv_id,row.jaccard.toFixed(4),
                      row.containment.toFixed(4)]){
        const td=document.createElement("td");td.textContent=v;tr.append(td);}
      tb.append(tr);}
    $("results").hidden=false;
    $("status").textContent=data.results.length+" hit(s)";
  }catch(e){$("status").textContent=e.message;$("status").className="err";}
};
</script></body></html>"""


class NddHttpServer:
    """Owns the index + a ThreadingHTTPServer; start()/shutdown() lifecycle.

    Built from a signatures parquet path (same contract as ``IndexActor``)
    so a restarted server re-loads from the checkpoint.
    """

    def __init__(self, signatures_path: str, cfg: NDDConfig | None = None,
                 rep_map_path: str | None = None, host: str = "127.0.0.1",
                 port: int = 0, n_shards: int = 1) -> None:
        import ray.data as rd

        if n_shards > 1:
            from .pipelines.query import ShardedNearDupIndex

            self.index = ShardedNearDupIndex(
                signatures_path, n_shards, cfg or NDDConfig(), rep_map_path
            )
        else:
            sigs = rd.read_parquet(signatures_path)
            rep_map = rd.read_parquet(rep_map_path) if rep_map_path else None
            self.index = NearDupIndex(sigs, cfg or NDDConfig(), rep_map)
        self._mutate_lock = threading.Lock()
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> None:
        """Serve on a daemon thread (returns immediately; use serve_forever
        for a foreground CLI server)."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # -- request handling --------------------------------------------------
    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr lines
            def log_message(self, fmt, *args):  # noqa: N802
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                if self.path in ("/", "/index.html"):
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(_DEMO_HTML)))
                    self.end_headers()
                    self.wfile.write(_DEMO_HTML)
                    return
                n = server.index.size()
                if self.path == "/health":
                    self._reply(200, {"ok": True, "size": n})
                elif self.path == "/size":
                    self._reply(200, {"size": n})
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):  # noqa: N802
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                except (ValueError, json.JSONDecodeError) as e:
                    self._reply(400, {"error": f"bad JSON body: {e}"})
                    return
                try:
                    if self.path == "/query":
                        # malformed CLIENT input (bad base64/utf-8, non-int k)
                        # is a 400, not a 500 — parse request fields before
                        # touching the index
                        try:
                            text = req.get("text")
                            if text is None and "text_b64" in req:
                                text = base64.b64decode(
                                    req["text_b64"], validate=True
                                ).decode("utf-8")
                            k = int(req.get("k", 30))
                        except (ValueError, TypeError, UnicodeDecodeError) as e:
                            self._reply(400, {"error": f"bad request field: {e}"})
                            return
                        if not isinstance(text, str):
                            self._reply(
                                400, {"error": "need 'text' or 'text_b64'"}
                            )
                            return
                        self._reply(
                            200, {"results": server.index.query_text(text, k)}
                        )
                    elif self.path == "/update":
                        import ray.data as rd

                        path = req["signatures_path"]
                        with server._mutate_lock:
                            n = server.index.ingest(rd.read_parquet(path))
                        self._reply(200, {"ingested": n})
                    elif self.path == "/evict":
                        ids = list(req["conv_ids"])
                        with server._mutate_lock:
                            n = server.index.evict(ids)
                        self._reply(200, {"evicted": n})
                    else:
                        self._reply(404, {"error": f"unknown path {self.path}"})
                except KeyError as e:
                    self._reply(400, {"error": f"missing field {e}"})
                except Exception as e:  # surface, don't kill the thread
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        return Handler
