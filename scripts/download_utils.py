"""Download + checksum utilities (scripts/{download,checksum,unzip_download}.py
roles): fetch URL lists, verify sha256 against a manifest, unzip.

python scripts/download_utils.py download --urls urls.txt --out downloads/
python scripts/download_utils.py checksum --manifest checksum.json --root downloads/
python scripts/download_utils.py unzip --root downloads/ --out data/
"""

import argparse
import hashlib
import json
import os
import sys
import urllib.request
import zipfile


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def cmd_download(args):
    os.makedirs(args.out, exist_ok=True)
    with open(args.urls) as f:
        urls = [line.strip() for line in f if line.strip()]
    for url in urls:
        name = os.path.basename(url.split("?")[0])
        dst = os.path.join(args.out, name)
        if os.path.exists(dst):
            print(f"[skip] {name}")
            continue
        print(f"[get ] {url}")
        urllib.request.urlretrieve(url, dst)
    return 0


def cmd_checksum(args):
    with open(args.manifest) as f:
        manifest = json.load(f)
    bad = 0
    for rel, expect in manifest.items():
        p = os.path.join(args.root, rel)
        if not os.path.exists(p):
            print(f"[miss] {rel}")
            bad += 1
            continue
        got = sha256_of(p)
        ok = got == expect
        print(f"[{'ok ' if ok else 'BAD'}] {rel}")
        bad += 0 if ok else 1
    return 1 if bad else 0


def cmd_unzip(args):
    os.makedirs(args.out, exist_ok=True)
    for name in sorted(os.listdir(args.root)):
        if not name.endswith(".zip"):
            continue
        p = os.path.join(args.root, name)
        print(f"[unzip] {name}")
        with zipfile.ZipFile(p) as z:
            z.extractall(args.out)
    return 0


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("download")
    d.add_argument("--urls", required=True)
    d.add_argument("--out", required=True)
    c = sub.add_parser("checksum")
    c.add_argument("--manifest", required=True)
    c.add_argument("--root", required=True)
    u = sub.add_parser("unzip")
    u.add_argument("--root", required=True)
    u.add_argument("--out", required=True)
    args = ap.parse_args()
    return {"download": cmd_download, "checksum": cmd_checksum,
            "unzip": cmd_unzip}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
