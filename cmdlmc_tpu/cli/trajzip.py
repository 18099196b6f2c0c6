"""``trajzip`` — interleave two xyz trajectories frame by frame
(reference misc/trajzip.py:6-32)."""

from __future__ import annotations

import argparse
import sys


def interleave(file1, file2, out=None):
    out = out or sys.stdout

    def frames(f):
        while True:
            header = f.readline()
            if not header.strip():
                return
            n = int(header)
            comment = f.readline()
            lines = [f.readline() for _ in range(n)]
            yield header, comment, lines

    for (h1, c1, l1), (h2, c2, l2) in zip(frames(file1), frames(file2)):
        out.write(h1)
        out.write(c1)
        out.writelines(l1)
        out.write(h2)
        out.write(c2)
        out.writelines(l2)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Interleave two xyz trajectories frame by frame"
    )
    parser.add_argument("file1")
    parser.add_argument("file2")
    args = parser.parse_args(argv)
    with open(args.file1) as f1, open(args.file2) as f2:
        interleave(f1, f2)


if __name__ == "__main__":
    main()
