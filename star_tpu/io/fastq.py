"""FASTQ/FASTA read input (host side).

Supports plain and process-substituted (readFilesCommand) inputs and
multi-file comma lists, mirroring the reference's input surface
(reference: source/readLoad.cpp, source/Parameters_openReadsFiles.cpp).
"""
from __future__ import annotations

import subprocess
from typing import Iterator, List, Optional, Tuple


def _open_one(path: str, command):
    if command and command[0] != "-":
        proc = subprocess.Popen(command + [path], stdout=subprocess.PIPE, text=True)
        return proc.stdout
    return open(path)


def _records(stream) -> Iterator[Tuple[str, str, str, int]]:
    """yield (name, seq, qual, file_type) where file_type: 1=fasta 2=fastq"""
    while True:
        header = stream.readline()
        if not header:
            return
        header = header.rstrip("\n")
        if not header:
            continue
        if header.startswith("@"):
            seq = stream.readline().rstrip("\n")
            stream.readline()  # +
            qual = stream.readline().rstrip("\n")
            yield header[1:].split()[0], seq, qual, 2
        elif header.startswith(">"):
            seq = stream.readline().rstrip("\n")
            yield header[1:].split()[0], seq, "A" * len(seq), 1
        else:
            raise ValueError(f"bad read header: {header}")


def read_pairs(files_in: List[str], command=None) -> Iterator[Tuple[str, List[str], List[str], int]]:
    """yield (name, [seqs...], [quals...], file_type) for SE or PE input."""
    for name, seqs, quals, ftype, _ in read_pairs_indexed(files_in, command):
        yield name, seqs, quals, ftype


def read_pairs_indexed(files_in: List[str], command=None
                       ) -> Iterator[Tuple[str, List[str], List[str], int, int]]:
    """read_pairs + the input-file index per read (the reference's
    readFilesIndex, used for RG attributes and SmartSeq well ids)."""
    mate_files = [f.split(",") for f in files_in if f not in ("", "-")]
    n_mates = len(mate_files)
    for i_file in range(len(mate_files[0])):
        streams = [_open_one(mate_files[m][i_file], command) for m in range(n_mates)]
        iters = [_records(s) for s in streams]
        while True:
            recs = []
            stop = False
            for it in iters:
                r = next(it, None)
                if r is None:
                    stop = True
                    break
                recs.append(r)
            if stop:
                break
            name = recs[0][0]
            for sep in "/ ":
                idx = name.find(sep)
                if idx >= 0:
                    name = name[:idx]
            yield (name, [r[1] for r in recs], [r[2] for r in recs],
                   recs[0][3], i_file)
        for s in streams:
            s.close()
