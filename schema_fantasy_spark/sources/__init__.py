"""Sources: deterministic synthetic Common-Crawl-style pages + testdata parquet."""
