"""ScanNet v2 downloader (counterpart of the reference's
`scannet/download-scannet.py`).

ScanNet requires accepting the terms of use, after which the maintainers
send a personal download URL. Pass it via ``--base_url``; this tool then
fetches, per scan, the four files the detection prep needs
(prep_scannet.py): `_vh_clean_2.ply`, `.aggregation.json`,
`_vh_clean_2.0.010000.segs.json`, `.txt`, plus the label-mapping tsv.

Usage:
    python -m iou3dmatch_tpu.data.download_scannet --base_url <your url> \
        --out scans --scan_list meta_data/scannet_train.txt
"""
import argparse
import os
import urllib.request

DETECTION_SUFFIXES = (
    "_vh_clean_2.ply",
    ".aggregation.json",
    "_vh_clean_2.0.010000.segs.json",
    ".txt",
)
LABEL_MAP = "scannetv2-labels.combined.tsv"


def fetch(url, dst):
    if os.path.exists(dst):
        return False
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, dst)
    return True


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base_url", required=True,
                   help="personal ScanNet URL received after accepting the ToS")
    p.add_argument("--out", default="scans")
    p.add_argument("--scan_list", required=True)
    p.add_argument("--version", default="v2")
    args = p.parse_args(argv)

    base = args.base_url.rstrip("/")
    fetch(f"{base}/{args.version}/tasks/{LABEL_MAP}",
          os.path.join(os.path.dirname(args.out) or ".", LABEL_MAP))
    with open(args.scan_list) as f:
        scans = [line.strip() for line in f if line.strip()]
    for scan in scans:
        for suffix in DETECTION_SUFFIXES:
            url = f"{base}/{args.version}/scans/{scan}/{scan}{suffix}"
            dst = os.path.join(args.out, scan, scan + suffix)
            try:
                if fetch(url, dst):
                    print(f"{scan}{suffix}: downloaded")
            except Exception as e:
                print(f"{scan}{suffix}: FAILED ({e})")


if __name__ == "__main__":
    main()
