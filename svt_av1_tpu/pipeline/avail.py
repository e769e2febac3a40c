"""Above-right / bottom-left reference availability (closed form).

The spec tracks a per-superblock BlockDecoded map; for square blocks whose
transform covers the whole block (this encoder's shape), availability
reduces to a closed form over the z-order position within the superblock —
verified bit-for-bit against the reference's has_tr/has_bl tables
(``EbIntraPrediction.c:5574ff``, has_top_right :5706, has_bottom_left
:5894) in tests. One flag pair per leaf serves all three planes (the
chroma derivation collapses to the luma one for 1:1 leaves in 4:2:0).
"""

from __future__ import annotations


def _morton(r: int, c: int) -> int:
    v = 0
    for b in range(6):
        v |= ((c >> b) & 1) << (2 * b)
        v |= ((r >> b) & 1) << (2 * b + 1)
    return v


def has_top_right(mi_row: int, mi_col: int, s4: int, mi_cols: int,
                  sb_mi: int = 16) -> bool:
    """s4: block size in mi units (square). Tile-relative mi coords."""
    if mi_row == 0:
        return False                      # no above row
    if mi_col + s4 >= mi_cols:
        return False                      # no right neighbor in frame
    blk_row = (mi_row & (sb_mi - 1)) // s4
    blk_col = (mi_col & (sb_mi - 1)) // s4
    if blk_row == 0:
        return True                       # top row of SB: above-right SB done
    if (blk_col + 1) * s4 >= sb_mi:
        return False                      # rightmost column of SB
    return _morton(blk_row - 1, blk_col + 1) < _morton(blk_row, blk_col)


def has_bottom_left(mi_row: int, mi_col: int, s4: int, mi_rows: int,
                    sb_mi: int = 16) -> bool:
    if mi_col == 0:
        return False                      # no left column
    if mi_row + s4 >= mi_rows:
        return False                      # no bottom neighbor in frame
    blk_row = (mi_row & (sb_mi - 1)) // s4
    blk_col = (mi_col & (sb_mi - 1)) // s4
    if blk_col == 0:
        return (blk_row + 1) * s4 < sb_mi  # left SB: until SB bottom
    if (blk_row + 1) * s4 >= sb_mi:
        return False                      # bottom row of SB
    return _morton(blk_row + 1, blk_col - 1) < _morton(blk_row, blk_col)
