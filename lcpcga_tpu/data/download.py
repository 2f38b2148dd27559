"""Raw point-cloud dataset downloader (MVUB / 8iVFBv2 / UVG-VPC).

Re-design of /root/reference/data/download_raw_pointclouds.py: fetches
the public archives, unpacks, and lays out the directory structure the
RawLoader templates expect. Network access is environment-dependent
(hermetic CI has none) — every fetch is gated and resumable.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
import zipfile
from typing import Dict, Iterable, Optional

MVUB_SEQUENCES = ["andrew9", "david9", "phil9", "ricardo9", "sarah9"]
MVUB_URL = (
    "https://plenodb.jpeg.org/pc/microsoft/phil9.ply.tar.gz"  # per-sequence pattern
)
EIVFB_URL = "https://plenodb.jpeg.org/pc/8ilabs/loot.tar.gz"
UVG_VPC_BASE = "https://ultravideo.fi/UVG-VPC"

ARCHIVES: Dict[str, Dict] = {
    "8iVFBv2": {
        "urls": [
            "https://plenodb.jpeg.org/pc/8ilabs/loot.tar.gz",
            "https://plenodb.jpeg.org/pc/8ilabs/longdress.tar.gz",
            "https://plenodb.jpeg.org/pc/8ilabs/soldier.tar.gz",
            "https://plenodb.jpeg.org/pc/8ilabs/redandblack.tar.gz",
        ],
    },
    "MVUB": {
        "urls": [
            f"https://plenodb.jpeg.org/pc/microsoft/{seq}.ply.tar.gz"
            for seq in MVUB_SEQUENCES
        ],
    },
}


def fetch(url: str, dest_dir: str, skip_existing: bool = True) -> Optional[str]:
    os.makedirs(dest_dir, exist_ok=True)
    name = os.path.join(dest_dir, url.rsplit("/", 1)[-1])
    if skip_existing and os.path.exists(name):
        return name
    try:
        urllib.request.urlretrieve(url, name + ".part")
    except Exception as e:  # zero-egress environments
        print(f"download failed for {url}: {e}")
        return None
    os.replace(name + ".part", name)
    return name


def unpack(archive: str, dest_dir: str) -> None:
    if archive.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(archive) as tf:
            tf.extractall(dest_dir, filter="data")
    elif archive.endswith(".zip"):
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(dest_dir)
    else:
        raise ValueError(f"unknown archive type: {archive}")


def download_datasets(names: Iterable[str], raw_dir: str = "./data/raw") -> None:
    for name in names:
        spec = ARCHIVES.get(name)
        if spec is None:
            print(f"unknown dataset {name!r}; known: {sorted(ARCHIVES)}")
            continue
        for url in spec["urls"]:
            archive = fetch(url, raw_dir)
            if archive:
                unpack(archive, os.path.join(raw_dir, name))


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Download raw point cloud datasets")
    ap.add_argument("--datasets", nargs="+", default=["8iVFBv2", "MVUB"])
    ap.add_argument("--raw-dir", default="./data/raw")
    args = ap.parse_args(argv)
    download_datasets(args.datasets, args.raw_dir)


if __name__ == "__main__":
    main()
