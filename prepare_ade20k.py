"""Download + verify ADE20K (SceneParse150) — equivalent of the
reference's prepare_ade20k.py (reference: prepare_ade20k.py:1-45):
fetches the ADEChallengeData2016 zip (and release_test) with sha1
verification and unpacks under --download-dir.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import urllib.request
import zipfile

FILES = [
    (
        "http://data.csail.mit.edu/places/ADEchallenge/"
        "ADEChallengeData2016.zip",
        "219e1696abb36c8ba3a3afe7fb2f4b4606a897c7",
    ),
    (
        "http://data.csail.mit.edu/places/ADEchallenge/release_test.zip",
        "e05747892219d10e9243933371a497e905a4860c",
    ),
]


def sha1(path: str) -> str:
    h = hashlib.sha1()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download-dir", default="datasets")
    args = p.parse_args()
    os.makedirs(args.download_dir, exist_ok=True)
    for url, checksum in FILES:
        name = os.path.join(args.download_dir, url.rsplit("/", 1)[1])
        if not (os.path.exists(name) and sha1(name) == checksum):
            print("downloading", url)
            urllib.request.urlretrieve(url, name)
            got = sha1(name)
            if got != checksum:
                raise RuntimeError(
                    f"sha1 mismatch for {name}: {got} != {checksum}"
                )
        with zipfile.ZipFile(name) as zf:
            zf.extractall(args.download_dir)
        print("ready:", name)


if __name__ == "__main__":
    main()
