"""Stateful crawl components: URL-seen shards, politeness, robots cache."""
