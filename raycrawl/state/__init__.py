"""Stateful components: cuckoo filter, frontier shards, robots cache."""
