"""Plans: the crawl round-loop engine and handler routing."""
