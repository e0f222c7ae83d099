"""Deterministic tar/tar.gz corpus twin for the archive oracle (q91).

Closed forms:

    n_files(d) = 1 + d % 4; gzip-wrapped when d is odd
    member 0   = 'src/' directory entry
    member j+1 = 'src/f<j>.txt',
                 text = 'line one of f<j> in <d % 1000>\\n'
                        'line two <(j * d) % 97>'

The reference repo has no container surface
(``/root/reference/src/sax/parser.rs:1``).
"""

from __future__ import annotations

from ..kernel.tarread import tar_write


def n_tar_files(doc_id: int) -> int:
    return 1 + doc_id % 4


def tar_file_text(doc_id: int, j: int) -> str:
    return (
        f"line one of f{j} in {doc_id % 1000}\n"
        f"line two {(j * doc_id) % 97}"
    )


def build_tarball(doc_id: int) -> bytes:
    members = [("src/", b"")]
    for j in range(n_tar_files(doc_id)):
        members.append((f"src/f{j}.txt", tar_file_text(doc_id, j).encode()))
    return tar_write(members, gzip_wrap=doc_id % 2 == 1)
