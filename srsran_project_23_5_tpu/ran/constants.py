"""3GPP NR constants that size every kernel in the framework.

Numeric values follow TS 38.211/38.212/38.214; the reference keeps the same
constants in include/srsran/phy/constants.h:28-43 and
include/srsran/phy/upper/channel_coding/ldpc/ldpc.h:39-113.
"""

# Resource-element geometry (TS 38.211 §4.4.4.1).
NRE = 12                 # subcarriers per resource block
MAX_RB = 275             # maximum resource blocks per carrier (FR1+FR2)
MAX_PORTS = 16           # maximum antenna ports handled by the PHY

MAX_NSYMB_PER_SLOT = 14  # OFDM symbols per slot, normal cyclic prefix

# LLR fixed-point domain (decode path runs saturating int8, mirroring the
# reference's log_likelihood_ratio type: include/srsran/phy/upper/
# log_likelihood_ratio.h:26-98).
LLR_MAX = 120            # largest LLR magnitude considered "soft"
LLR_INFTY = 127          # reserved magnitude meaning "surely known bit"

# LDPC base-graph geometry (TS 38.212 §5.3.2; ldpc_graph_impl.h:39-55).
LDPC_BG1_M = 46          # BG1 check nodes (base rows)
LDPC_BG1_N_FULL = 68     # BG1 variable nodes before shortening
LDPC_BG1_K = 22          # BG1 message columns (K = 22*Zc)
LDPC_BG2_M = 42
LDPC_BG2_N_FULL = 52
LDPC_BG2_K = 10
LDPC_MAX_LIFTING_SIZE = 384
LDPC_MAX_MESSAGE_SIZE = LDPC_BG1_K * LDPC_MAX_LIFTING_SIZE      # 8448
LDPC_MAX_CODEBLOCK_SIZE = 66 * LDPC_MAX_LIFTING_SIZE            # 25344

# Max segment sizes per base graph (TS 38.212 §5.2.2).
LDPC_MAX_SEG_BG1 = 8448
LDPC_MAX_SEG_BG2 = 3840

# Polar coding (TS 38.212 §5.3.1; polar_code.h:55-58).
POLAR_NMAX_LOG = 10
POLAR_NMAX = 1 << POLAR_NMAX_LOG

# PRACH Zadoff-Chu sequence lengths (TS 38.211 §6.3.3.1).
PRACH_LONG_SEQ_LEN = 839
PRACH_SHORT_SEQ_LEN = 139

# Gold sequence offset Nc (TS 38.211 §5.2.1).
GOLD_NC = 1600
