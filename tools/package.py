"""Build dist/flyscrape_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import shutil
from pathlib import Path


def build() -> str:
    repo = Path(__file__).resolve().parent.parent
    dist = repo / "dist"
    dist.mkdir(exist_ok=True)
    archive = shutil.make_archive(
        str(dist / "flyscrape_spark"), "zip",
        root_dir=repo, base_dir="flyscrape_spark",
    )
    print(archive)
    return archive


if __name__ == "__main__":
    build()
