"""Robots rules cache — admission gating + crawl-delay lookup.

Parity with the reference's ``Crawler._get_robots``
(/root/reference/simple_crawler/crawler.py:182-194): rules come from the
corpus row ``http://{host}/robots.txt`` parsed with
``urllib.robotparser.RobotFileParser``; a missing/failed robots fetch parses
empty = allow-all. ``can_fetch`` is evaluated against the NORMALIZED url
string, as the reference does (``str(url)`` at crawler.py:225).

Design for scale: one named RobotsCache actor is the authority (it reads
only the tiny robots slice of the corpus once); the admission gate runs as a
stateless-looking map_batches stage whose workers each hold a local
compiled-rules cache and pull missing hosts' RULE TEXT from the actor —
one actor round-trip per (worker, host), not per URL or per batch.
"""

from __future__ import annotations

import urllib.robotparser

import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray

__all__ = ["RobotsCache", "RulesView", "load_robots_texts"]


def load_robots_texts(corpus_path: str) -> dict:
    """host -> robots.txt text, from the corpus ``/robots.txt`` rows.

    Reads only the ``url``/``text`` columns with a suffix predicate — the
    robots slice is O(number of hosts), never the whole corpus.
    """
    ds = pads.dataset(corpus_path)
    tbl = ds.to_table(
        columns=["url", "text"],
        filter=pc.ends_with(pc.field("url"), "/robots.txt"),
    )
    out = {}
    for url, text in zip(tbl["url"].to_pylist(), tbl["text"].to_pylist()):
        netloc = url.split("://", 1)[1].split("/", 1)[0]
        # key on the bare hostname (no port) — the engine's canonical host
        # key everywhere (frontier shard key, corpus bucket key)
        out[netloc.rsplit(":", 1)[0] if ":" in netloc else netloc] = text
    return out


def _parse(host: str, text: str | None) -> urllib.robotparser.RobotFileParser:
    rp = urllib.robotparser.RobotFileParser(f"http://{host}/robots.txt")
    # error/missing -> parse empty = allow-all (crawler.py:186-192)
    rp.parse((text or "").splitlines())
    return rp


class RulesView:
    """Worker-local compiled-rules cache over a {host: text} mapping.

    Used inside gate stages: construct once per worker from a broadcast
    dict (ray.put) or an actor handle, then ``allowed``/``delay`` per URL.
    """

    def __init__(self, texts_or_actor):
        self._actor = None
        self._texts = {}
        if isinstance(texts_or_actor, dict):
            self._texts = texts_or_actor
        else:
            self._actor = texts_or_actor
        self._compiled: dict = {}

    def _rules(self, host: str) -> urllib.robotparser.RobotFileParser:
        rp = self._compiled.get(host)
        if rp is None:
            if host in self._texts:
                text = self._texts[host]
            elif self._actor is not None:
                text = ray.get(self._actor.rules_text.remote(host))
                self._texts[host] = text
            else:
                text = None
            rp = _parse(host, text)
            self._compiled[host] = rp
        return rp

    def allowed(self, user_agent: str, host: str, url_norm: str) -> bool:
        return self._rules(host).can_fetch(user_agent, url_norm)

    def delay(self, user_agent: str, host: str):
        d = self._rules(host).crawl_delay(user_agent)
        return None if d is None else int(d)


@ray.remote(num_cpus=0)  # reservation only; see FrontierShard note
class RobotsCache:
    """Authority for robots rule text, loaded once from the corpus."""

    def __init__(self, corpus_path: str):
        self._texts = load_robots_texts(corpus_path)
        self._view = RulesView(self._texts)

    def rules_text(self, host: str):
        return self._texts.get(host)

    def all_texts(self) -> dict:
        return self._texts

    def delays(self, user_agent: str, hosts: list) -> dict:
        """host -> crawl_delay seconds (only hosts that have one)."""
        out = {}
        for h in hosts:
            d = self._view.delay(user_agent, h)
            if d:
                out[h] = d
        return out

    def check(self, user_agent: str, hosts: list, url_norms: list) -> list:
        """Vector admission check: bool per url."""
        return [
            self._view.allowed(user_agent, h, u)
            for h, u in zip(hosts, url_norms)
        ]
