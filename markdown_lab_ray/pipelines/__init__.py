"""End-to-end pipelines: convert, crawl (Ray BSP rounds), oracle."""
