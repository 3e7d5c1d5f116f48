"""``python -m flyscrape_spark`` — the reference's CLI entrypoint
(/root/reference/cmd/flyscrape/main.go)."""

from flyscrape_spark.cli import main

raise SystemExit(main())
