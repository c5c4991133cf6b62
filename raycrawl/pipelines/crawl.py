"""Placeholder — the round-based crawl loop lands after the stateful stages."""


def crawl(*args, **kwargs):
    raise NotImplementedError("crawl pipeline under construction")
