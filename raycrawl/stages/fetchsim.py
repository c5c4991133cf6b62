"""FetchSimulator — the corpus-lookup replacement for live HTTP.

map_batches stage (used inside the fused CrawlRoundStage). Replaces the
reference's ``Requester`` (/root/reference/simple_crawler/requester.py:45-105):
status codes, Content-Type and redirect behavior are derived from the corpus
and the FIXTURES.md rules, mirroring the reference's own test HTTP routes:

* URL absent from corpus              -> 404        (ClientError path)
* path ``/error/<code>``              -> that code  (4xx/5xx paths)
* path ``/redirect/<p>``              -> 302, Location ``/<p>``
* suffix mime map: ``.pdf -> text/pdf``, ``.png -> image/png``,
  ``.css -> text/css``, ``/robots.txt -> text/plain``, else ``text/html``
* ``follow_redirects=True`` (reference default) chases the Location chain
  inside the corpus (bounded hops) and reports the FINAL status/body under
  the ORIGINAL url — exactly what requests does for the reference

Execution model: the corpus is laid out ``bucket=<b>/`` by host-hash
(sources/synth.py). Buckets load ONCE per crawl as single-chunk ARROW
TABLES plus a sorted-hash url index (both built in a parallel task wave,
shared zero-copy through plasma); per batch the lookup is one vectorized
hash + searchsorted probe + a ``take`` per touched bucket — O(batch log
bucket), independent of bucket size, with zero per-worker index build
(an ``index_in`` per batch re-hashes the whole bucket and degrades with
corpus growth; a per-worker url->row dict paid O(bucket) build + ~100 MB
in EVERY worker process). Output row order within a batch is unspecified
(every downstream stage is row-independent). Classification
(error/redirect paths) is cheap per-row string work; the heavy columns
(html/text) never leave Arrow until the extractor decodes them.

At 100 TB the per-bucket table becomes a lazy row-group index over Parquet
metadata; the batch flow and vectorized lookup stay identical.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray

from raycrawl.functions.canonicalize import normalise_url
from raycrawl.sources.synth import host_bucket

__all__ = ["FetchSimulator", "content_type_for_path"]

_MAX_HOPS = 8

_HASH_SEED = 0x5EED_C0DE

# (corpus_path, bucket) -> (pa.Table VIEW over plasma shared memory,
# sorted-hash url index — see build_url_index); worker-process lifetime.
# The bytes live once per node in the object store; the index is built
# ONCE (in the bucket-read task) and shared zero-copy, so workers pay no
# per-worker O(bucket) dict build (16 workers x a 768k-url python dict was
# ~100 MB AND ~0.5 s of warmup EACH). pc.index_in is still worse: it
# re-hashes the whole bucket on EVERY call (measured: 16-CPU throughput
# dropped 37% when the corpus doubled).
_BUCKET_CACHE: dict = {}


def build_url_index(url_col):
    """(h_sorted, order): vectorized url -> row-index lookup state.

    One stable 64-bit hash per url (polars, vectorized), argsorted so a
    probe is np.searchsorted — O(batch log n) per batch with ZERO build
    cost in the probing worker. Collisions are resolved at probe time by
    verifying url equality and walking the equal-hash run (lookup_rows).
    """
    import polars as pl

    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    h = pl.from_arrow(url_col).hash(seed=_HASH_SEED).to_numpy()
    order = np.argsort(h, kind="stable").astype(np.int64)
    return h[order], order


def lookup_rows(finals: list, index, urls_col) -> np.ndarray:
    """Row indices of ``finals`` in the bucket (-1 = absent).

    Vectorized probe of the shared sorted-hash index; every hash hit is
    verified against the actual url (a 64-bit collision must yield the
    CORRECT row or -1, never a wrong row — byte-parity depends on it),
    with mismatches walking the equal-hash run scalar-side (runs are
    length 1 in practice).
    """
    import polars as pl

    n_rows = len(urls_col)
    out = np.full(len(finals), -1, dtype=np.int64)
    if not finals or n_rows == 0:
        return out
    h_sorted, order = index
    hb = pl.Series(finals, dtype=pl.Utf8).hash(seed=_HASH_SEED).to_numpy()
    pos = np.searchsorted(h_sorted, hb)
    in_range = pos < n_rows
    safe_pos = np.minimum(pos, n_rows - 1)
    valid = in_range & (h_sorted[safe_pos] == hb)
    if not valid.any():
        return out
    cand_rows = order[safe_pos[valid]]
    got = urls_col.take(pa.array(cand_rows, pa.int64()))
    q_idx = np.nonzero(valid)[0]
    eq = pc.equal(got, pa.array([finals[i] for i in q_idx])).to_numpy(
        zero_copy_only=False
    ).astype(bool)
    out[q_idx[eq]] = cand_rows[eq]
    # hash-collision stragglers: walk the (sorted) equal-hash run
    for qi in q_idx[~eq]:
        p = int(pos[qi])
        h = hb[qi]
        u = finals[qi]
        while p < n_rows and h_sorted[p] == h:
            r = int(order[p])
            if urls_col[r].as_py() == u:
                out[qi] = r
                break
            p += 1
    return out


@ray.remote(num_cpus=0.25)
def _read_bucket(corpus_path: str, b: int, with_body: bool = True):
    """One bucket -> (single-chunk table, shared url index) in plasma.

    Runs as a task so preloading a corpus' buckets is PARALLEL (the
    lazy-inside-the-actor path serialized ~8 parquet reads behind round
    0's first tasks — measured as a fixed ~2 s of per-run serial cost).
    combine_chunks before returning: Table.take against a multi-chunk
    column pays O(table) per call (measured 444 ms vs 0.7 ms single-chunk
    on a 746k-row bucket).
    """
    ds = pads.dataset(corpus_path, partitioning="hive")
    tbl = ds.to_table(
        columns=["url", "html", "text"] if with_body else ["url"],
        filter=pc.field("bucket") == b,
    ).combine_chunks()
    return tbl, build_url_index(tbl.column("url"))


@ray.remote(num_cpus=0)
class BucketStore:
    """Owner of the corpus bucket tables in the object store.

    Each bucket is read from Parquet ONCE per crawl — by a parallel
    ``_read_bucket`` task wave when ``preload`` is called (crawl() does,
    overlapping the reads with seeding and round-0 spin-up), else lazily
    on first touch — and lives in plasma as (table, url-index); every
    fetch worker on the node maps the same physical bytes zero-copy. At
    100 TB scale get_ref becomes a per-node cache over lazily-read
    row-group ranges; the worker-side protocol is unchanged.
    """

    def __init__(self, corpus_path: str):
        self.corpus_path = corpus_path
        self._refs: dict = {}
        self._url_refs: dict = {}

    def preload(self, buckets) -> int:
        for b in buckets:
            if b not in self._refs:
                self._refs[b] = _read_bucket.remote(self.corpus_path, b)
        return len(self._refs)

    def get_ref(self, b: int):
        ref = self._refs.get(b)
        if ref is None:
            ref = _read_bucket.remote(self.corpus_path, b)
            self._refs[b] = ref
        return ref

    def get_url_ref(self, b: int):
        """url-only bucket view — the check_head body-IO-pruned read.

        A bucket touched only by wrong-mime lookups never loads its
        html/text columns from Parquet (the reference's HEAD gate exists
        to avoid exactly this body transfer, requester.py:81-105).
        """
        ref = self._url_refs.get(b)
        if ref is None:
            full = self._refs.get(b)
            if full is not None:
                tbl, index = ray.get(full)  # already resident
                ref = ray.put((tbl.select(["url"]), index))
            else:
                ref = _read_bucket.remote(self.corpus_path, b, False)
            self._url_refs[b] = ref
        return ref

_OUT_FIELDS = [
    ("status", pa.int16()),
    ("content_type", pa.string()),
    ("location", pa.string()),
    ("html", pa.binary()),
    ("text", pa.string()),
]


def content_type_for_path(path: str) -> str:
    if path.endswith("/robots.txt"):
        return "text/plain"
    if path.endswith(".pdf"):
        return "text/pdf"
    if path.endswith(".png"):
        return "image/png"
    if path.endswith(".css"):
        return "text/css"
    return "text/html"


class FetchSimulator:
    """Frontier rows (url_raw, url_norm, host, depth) ->
    + status, content_type, location, html, text."""

    def __init__(
        self,
        corpus_path: str,
        n_buckets: int,
        follow_redirects: bool = True,
        load_body_mimes: tuple | None = ("text/html",),
        check_head: bool = False,
        max_cached_buckets: int = 64,
        bucket_store=None,
    ):
        self.corpus_path = corpus_path
        self.n_buckets = n_buckets
        self.bucket_store = bucket_store
        self.follow_redirects = follow_redirects
        # check_head=True mirrors the reference's HEAD-before-GET gate
        # (requester.py:81-105): a wrong-mime row's BODY columns are never
        # loaded — here that means html/text stay null for those rows
        # (routing downstream is identical either way: wrong mime -> done
        # without extraction). The saving is real when non-html rows are a
        # large corpus fraction.
        self.check_head = check_head
        self.load_body_mimes = tuple(m.lower() for m in (load_body_mimes or ()))
        self.max_cached_buckets = max_cached_buckets
        self._ds = pads.dataset(corpus_path, partitioning="hive")

    # -- corpus access ------------------------------------------------------
    def _bucket_table(self, b: int, with_body: bool = True):
        # per-worker cache of zero-copy plasma views: the parquet read AND
        # the url index build happen once per crawl in a _read_bucket task;
        # without a store (standalone use) fall back to a direct read.
        # Store identity in the key = cache buster across crawls (a corpus
        # regenerated at the same path gets a fresh store, hence fresh
        # views). with_body=False is the check_head pruned read: url
        # column only, no html/text IO for the bucket.
        full_key = (self.corpus_path, b, str(self.bucket_store), True)
        if not with_body:
            ent = _BUCKET_CACHE.get(full_key)
            if ent is not None:
                return ent  # full table already resident — reuse its index
        key = full_key if with_body else (self.corpus_path, b,
                                          str(self.bucket_store), False)
        ent = _BUCKET_CACHE.get(key)
        if ent is None:
            if self.bucket_store is not None:
                meth = (self.bucket_store.get_ref if with_body
                        else self.bucket_store.get_url_ref)
                ent = ray.get(ray.get(meth.remote(b)))
            else:
                # single-chunk columns keep per-batch Table.take O(batch);
                # a chunked bucket pays O(table) PER take (600x measured)
                tbl = self._ds.to_table(
                    columns=["url", "html", "text"] if with_body else ["url"],
                    filter=pc.field("bucket") == b,
                ).combine_chunks()
                ent = (tbl, build_url_index(tbl.column("url")))
            if len(_BUCKET_CACHE) >= self.max_cached_buckets:
                _BUCKET_CACHE.pop(next(iter(_BUCKET_CACHE)))
            _BUCKET_CACHE[key] = ent
        return ent

    # -- per-row classification (string work only) --------------------------
    def _classify(self, url_norm: str, host: str):
        """-> ("lookup", final_url, bucket) | ("status", code, location).

        The fragment is stripped before lookup: HTTP clients never send it
        (requests drops it at transport), so the reference fetches the
        fragment-less resource and records it under the fragment-carrying
        url — crawls with trim_fragment=False depend on this.
        """
        url = url_norm.split("#", 1)[0]
        for _hop in range(_MAX_HOPS):
            parts = urlsplit(url)
            path = parts.path
            if path.startswith("/error/"):
                try:
                    code = int(path.split("/")[2])
                except (IndexError, ValueError):
                    code = 404
                return ("status", code, None)
            if path.startswith("/redirect/"):
                location = "/" + path[len("/redirect/"):]
                if not self.follow_redirects:
                    return ("status", 302, location)
                url = normalise_url(urljoin(url, location))
                continue
            return ("lookup", url, host_bucket(parts.hostname or host,
                                              self.n_buckets))
        return ("status", 508, None)  # redirect loop exhausted

    # -- batch entry --------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        norms = batch.column("url_norm").to_pylist()
        hosts = batch.column("host").to_pylist()

        # positions by outcome; under check_head the mime is derivable from
        # the final url's path BEFORE any corpus IO, so wrong-mime rows
        # group separately and probe a url-only bucket table (the
        # reference's HEAD gate avoids the body transfer; substring
        # containment mirrors requester.py:75-79 / the downstream router)
        stub_pos, stub_status, stub_loc = [], [], []
        by_group: dict = {}  # (bucket, need_body) -> (positions, finals, ctypes)
        for i, (u, h) in enumerate(zip(norms, hosts)):
            kind, a, b = self._classify(u, h)
            if kind == "status":
                stub_pos.append(i)
                stub_status.append(a)
                stub_loc.append(b)
            else:
                ctype = content_type_for_path(urlsplit(a).path)
                need_body = (not self.check_head) or any(
                    m in ctype for m in self.load_body_mimes
                )
                pos, finals, ctl = by_group.setdefault(
                    (b, need_body), ([], [], [])
                )
                pos.append(i)
                finals.append(a)
                ctl.append(ctype)

        parts = []
        if stub_pos:
            sub = batch.take(pa.array(stub_pos, pa.int64()))
            n = len(stub_pos)
            parts.append(
                self._with_cols(
                    sub,
                    status=pa.array(stub_status, pa.int16()),
                    content_type=pa.array(["text/html"] * n, pa.string()),
                    location=pa.array(stub_loc, pa.string()),
                    html=pa.nulls(n, pa.binary()),
                    text=pa.nulls(n, pa.string()),
                )
            )

        for (b, need_body), (pos, finals, ctl) in by_group.items():
            tbl, url_index = self._bucket_table(b, with_body=need_body)
            # shared sorted-hash probe: O(batch log bucket) per batch, zero
            # per-worker build cost (pc.index_in would re-hash the whole
            # bucket per batch; a per-worker dict costs O(bucket) to build
            # in EVERY worker process)
            idx_arr = pa.array(
                lookup_rows(finals, url_index, tbl.column("url")), pa.int64()
            )
            found = pc.not_equal(idx_arr, -1)
            ctypes = pa.array(ctl, pa.string())

            f_sel = pc.indices_nonzero(found)
            if len(f_sel):
                sub = batch.take(pa.array(pos, pa.int64()).take(f_sel))
                n = len(f_sel)
                f_ctypes = ctypes.take(f_sel)
                if need_body and "html" in tbl.column_names:
                    rows = tbl.take(idx_arr.take(f_sel))
                    html_col = rows.column("html")
                    text_col = rows.column("text")
                else:
                    # HEAD gate: wrong-mime rows exist in the corpus but
                    # their body is never read — html/text stay null
                    html_col = pa.nulls(n, pa.binary())
                    text_col = pa.nulls(n, pa.string())
                parts.append(
                    self._with_cols(
                        sub,
                        status=pa.array([200] * n, pa.int16()),
                        content_type=f_ctypes,
                        location=pa.nulls(n, pa.string()),
                        html=html_col,
                        text=text_col,
                    )
                )
            m_sel = pc.indices_nonzero(pc.invert(found))
            if len(m_sel):
                sub = batch.take(pa.array(pos, pa.int64()).take(m_sel))
                n = len(m_sel)
                parts.append(
                    self._with_cols(
                        sub,
                        status=pa.array([404] * n, pa.int16()),
                        content_type=ctypes.take(m_sel),
                        location=pa.nulls(n, pa.string()),
                        html=pa.nulls(n, pa.binary()),
                        text=pa.nulls(n, pa.string()),
                    )
                )

        if not parts:
            schema = batch.schema
            for name, typ in _OUT_FIELDS:
                schema = schema.append(pa.field(name, typ))
            return schema.empty_table()
        return pa.concat_tables(parts)

    @staticmethod
    def _with_cols(sub: pa.Table, **cols) -> pa.Table:
        for name, _typ in _OUT_FIELDS:
            col = cols[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            sub = sub.append_column(name, col)
        return sub
    # NB: lookups hit the bucket of the FINAL url's host (redirects may
    # cross buckets); parts carry the ORIGINAL frontier row columns, so a
    # followed redirect reports the final body under the original url —
    # matching requests' behavior for the reference.
