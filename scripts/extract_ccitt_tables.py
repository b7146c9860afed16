#!/usr/bin/env python3
"""Re-serialize the standard ITU-T T.4/T.6 CCITT fax code tables as JSON data.

The mode / white-run / black-run / uncompressed prefix-code tables are
standard data published in ITU-T Recommendations T.4 and T.6 (the same
standards data every fax decoder embeds).  We extract them from the
reference implementation's parse tries (reference: pdfminer/ccitt.py:74-321)
into a neutral ``{bitstring: value}`` JSON resource, exactly like the
public Adobe AGL / encoding / CMap data under resources/.

Output: pdfminer_six_spark/resources/ccitt_codes.json.gz
  {"mode": {bits: value}, "white": {bits: runlen}, "black": {bits: runlen},
   "uncompressed": {bits: value}}
"""

import gzip
import json
import sys

sys.path.insert(0, "/root/reference")

from pdfminer.ccitt import CCITTG4Parser  # noqa: E402


def walk(node, prefix="", out=None):
    if out is None:
        out = {}
    for bit, child in enumerate(node):
        if child is None:
            continue
        if isinstance(child, list):
            walk(child, prefix + str(bit), out)
        else:
            out[prefix + str(bit)] = child
    return out


def main():
    tables = {
        "mode": walk(CCITTG4Parser.MODE),
        "white": walk(CCITTG4Parser.WHITE),
        "black": walk(CCITTG4Parser.BLACK),
        "uncompressed": walk(CCITTG4Parser.UNCOMPRESSED),
    }
    path = "pdfminer_six_spark/resources/ccitt_codes.json.gz"
    with gzip.open(path, "wt") as f:
        json.dump(tables, f, sort_keys=True)
    for k, v in tables.items():
        print(k, len(v), "codes")
    print("wrote", path)


if __name__ == "__main__":
    main()
