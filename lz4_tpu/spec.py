"""LZ4 wire-format constants.

These mirror the *formats* defined by the public LZ4 specs shipped with the
reference tree (`lz4_Block_format.md`, `lz4_Frame_format.md`) and the fork's
scatter-gather conventions (reference `lib/lz4sg.c`).  Only format facts live
here -- no algorithm state.
"""

# ---------------------------------------------------------------------------
# Block format (lz4_Block_format.md)
# ---------------------------------------------------------------------------

MINMATCH = 4                 # minimum match length encodable (token low nibble 0)
ML_BITS = 4                  # match-length bits in the token
ML_MASK = (1 << ML_BITS) - 1  # 15
RUN_BITS = 8 - ML_BITS       # literal-length bits in the token
RUN_MASK = (1 << RUN_BITS) - 1  # 15

MAX_DISTANCE = 65535         # maximum match offset (2-byte LE, 0 invalid)

# Parsing restrictions (lz4_Block_format.md "Parsing restrictions"):
#   1. the last 5 bytes of a block are always literals
#   2. the last match must start at least 12 bytes before the end
LASTLITERALS = 5
MFLIMIT = 12
LZ4_MINLENGTH = MFLIMIT + 1  # blocks shorter than 13 bytes are stored as literals

# Worst-case compressed size for an n-byte input (reference lib/lz4.h:106
# documents the same bound: n + n/255 + 16).
def compress_bound(n: int) -> int:
    """Maximum compressed size of an ``n``-byte block (0 if n too large)."""
    if n > 0x7E000000:
        return 0
    return n + n // 255 + 16


# ---------------------------------------------------------------------------
# Frame format (lz4_Frame_format.md, spec v1.5.1)
# ---------------------------------------------------------------------------

FRAME_MAGIC = 0x184D2204
LEGACY_MAGIC = 0x184C2102
SKIPPABLE_MAGIC_MIN = 0x184D2A50   # 0x184D2A50 .. 0x184D2A5F all valid
SKIPPABLE_MAGIC_MASK = 0xFFFFFFF0

FLG_VERSION = 0b01           # 2-bit version field, must be 01
MIN_FRAME_HEADER_SIZE = 7    # magic + FLG + BD + HC
MAX_FRAME_HEADER_SIZE = 15   # + 8-byte content size
BLOCK_HEADER_SIZE = 4        # LE32 block size
ENDMARK_SIZE = 4             # LE32 zero
UNCOMPRESSED_BIT = 0x80000000  # high bit of block size => stored, not compressed

# BD byte block-max-size IDs -> byte sizes (lz4_Frame_format.md table)
BLOCK_SIZES = {4: 64 * 1024, 5: 256 * 1024, 6: 1024 * 1024, 7: 4 * 1024 * 1024}
DEFAULT_BLOCK_SIZE_ID = 7
LEGACY_BLOCK_SIZE = 8 * 1024 * 1024


def optimal_block_size_id(block_size_hint: int) -> int:
    """Smallest standard block-size ID whose size >= hint (min 64KB)."""
    for bsid in (4, 5, 6, 7):
        if block_size_hint <= BLOCK_SIZES[bsid]:
            return bsid
    return 7


# ---------------------------------------------------------------------------
# Scatter-gather conventions (reference lib/lz4sg.c, lib/lz4sg.h)
# ---------------------------------------------------------------------------

SG_FRAME_HEADER_SIZE = 15    # magic + FLG + BD + 8B content size + HC (lz4sg.c:115)
SG_MAX_BLOCK_SIZE = 4 * 1024 * 1024     # each SG block <= 4MB (lz4sg.c:544)
SG_MIN_OUT_BUF = 10          # every output buffer must hold >= 10 bytes (lz4sg.c:413)
# first output buffer must hold header + block header + 2 bytes (lz4sg.c:707-713)
SG_MIN_FIRST_OUT = SG_FRAME_HEADER_SIZE + BLOCK_HEADER_SIZE + 2

# LZ4 streaming window
WINDOW_SIZE = 64 * 1024

# Error codes for the scatter-gather layer (negative ints, matching the
# reference's convention of lz4sg.c:217-264).
SG_OK = 0
SG_ERR_PARAM = -1
SG_ERR_OUT_SPACE = -2
SG_ERR_MAGIC = -3
SG_ERR_CONTENT_CHECKSUM = -4
SG_ERR_BLOCK_CHECKSUM = -5
SG_ERR_NO_CONTENT_SIZE = -6
SG_ERR_BLOCK_INDEP = -7
