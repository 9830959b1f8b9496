"""Structured Streaming surfaces of the crawl engine."""
