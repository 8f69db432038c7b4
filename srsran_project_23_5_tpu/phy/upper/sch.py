"""Shared-channel processors: PDSCH transmit and PUSCH receive.

TPU-native re-expression of the reference's channel processors:

- PDSCH TX (pdsch_processor_impl.cpp:102-141: encode → scramble →
  modulate → map → DM-RS): here the whole transport block is processed as
  one jitted static-shape program; codeblocks are a batch dimension of the
  LDPC kernel instead of a thread-pool fan-out
  (pdsch_processor_concurrent_impl.h:37-62).
- PUSCH RX (pusch_processor_impl.cpp:125-279: DM-RS channel estimation →
  equalize → soft demap → descramble → rate-dematch → LDPC decode → CRC):
  same chain in reverse over [rx_port, symbol, subcarrier] grids.

Configurations are frozen dataclasses; each distinct shape compiles once.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

import jax

from ...ops import (dmrs, equalizer, estimator, gold, modulation,
                    precoding)
from ...ops.ldpc import (decoder, decoder_pallas, encoder, encoder_pallas,
                         rate_match, segmentation)
from ...ran import ldpc_params
from ...ran.constants import LLR_MAX, NRE
from . import ulsch


@functools.lru_cache(maxsize=256)
def _scramble_seq(cinit: int, nof_bits: int) -> np.ndarray:
    """Host-precomputed scrambling sequence (static per ShConfig): the
    Gold LFSR is pure config, so bake it as an int8 constant instead of
    re-deriving ~1 Mbit of sequence on device every slot
    (pseudo_random_generator_impl.cpp precomputes x1/x2 state tables for
    the same reason)."""
    return gold.gold_sequence_np(cinit, nof_bits).astype(np.int8)


@dataclasses.dataclass(frozen=True)
class ShConfig:
    """Static configuration of one PDSCH/PUSCH allocation.

    nof_layers 1 (SISO/SIMO) or 2 (spatial multiplexing; DM-RS ports 0/1
    CDM-multiplexed with the frequency OCC, requires
    dmrs_cdm_groups_without_data == 2 and ≥2 rx ports on receive).
    """
    rnti: int
    tbs: int                     # transport block size (bits)
    qm: int                      # modulation order (2/4/6/8)
    rv: int = 0
    nof_layers: int = 1
    # allocation
    prb_start: int = 0
    nof_prb: int = 106
    first_symbol: int = 0
    nof_symbols: int = 14
    # DM-RS (type 1, CDM group 0)
    dmrs_symbols: tuple[int, ...] = (2, 7, 11)
    dmrs_cdm_groups_without_data: int = 2
    nid: int = 1                 # scrambling identity
    nid_dmrs: int = 1
    n_scid: int = 0
    slot_in_frame: int = 0
    # per-symbol time interpolation across DM-RS symbols (drifting
    # channels); default False = reference's average_impl behavior
    time_interp: bool = False
    # interleaved VRB→PRB mapping (TS 38.211 §7.3.1.6, bundle 2) over the
    # BWP [0, bwp_nof_prb) (0 ⇒ prb_start + nof_prb); the permutation is
    # baked into one static gather per slot (vrb_to_prb_mapper.cpp)
    vrb_to_prb_interleaved: bool = False
    bwp_nof_prb: int = 0
    # RE-pattern reservations (resource_grid re_pattern / the reference's
    # PDSCH reserved-RE lists): ((symbol, (sc_offsets_in_prb, ...)), ...)
    # — data mapping skips those REs on those symbols (e.g. a CSI-RS
    # resource riding the same slot).  Offsets are per-PRB (0..11) and
    # apply to every PRB of the allocation; combined with VRB→PRB
    # interleaving this stays physically correct because the bundle
    # permutation moves whole PRBs, preserving in-PRB offsets.
    reserved_patterns: tuple = ()
    # UCI multiplexed on PUSCH (TS 38.212 §6.2.7); empty for PDSCH
    uci: ulsch.UciOnPusch = ulsch.UciOnPusch()

    # ------------------------------------------------------------------
    @functools.cached_property
    def data_re_indices(self) -> tuple[np.ndarray, np.ndarray]:
        """(symbol_idx, sc_idx) arrays of data REs in mapping order."""
        sc_lo = self.prb_start * NRE
        sc_hi = (self.prb_start + self.nof_prb) * NRE
        resv = dict(self.reserved_patterns)
        syms, scs = [], []
        for l in range(self.first_symbol, self.first_symbol + self.nof_symbols):
            if l in self.dmrs_symbols:
                if self.dmrs_cdm_groups_without_data >= 2:
                    continue  # whole symbol reserved for DM-RS
                ks = np.arange(sc_lo + 1, sc_hi, 2)  # other comb offset
            elif l in resv:
                keep = np.setdiff1d(np.arange(NRE), np.asarray(resv[l]))
                prbs = np.arange(self.prb_start,
                                 self.prb_start + self.nof_prb)
                ks = (prbs[:, None] * NRE + keep[None, :]).reshape(-1)
            else:
                ks = np.arange(sc_lo, sc_hi)
            syms.append(np.full(ks.shape, l, dtype=np.int32))
            scs.append(ks.astype(np.int32))
        return np.concatenate(syms), np.concatenate(scs)

    @functools.cached_property
    def nof_data_re(self) -> int:
        return len(self.data_re_indices[0])

    @functools.cached_property
    def nof_bits(self) -> int:
        return self.nof_data_re * self.qm * self.nof_layers

    @functools.cached_property
    def code_rate(self) -> float:
        return self.tbs / self.nof_bits

    @functools.cached_property
    def segments(self) -> ldpc_params.SegmentParams:
        bg = ldpc_params.base_graph(self.tbs, self.code_rate)
        return ldpc_params.segment_tb(self.tbs, bg)

    @functools.cached_property
    def uci_maps_key(self) -> tuple:
        u = self.uci
        return (self.nof_prb, self.qm, self.nof_layers, self.first_symbol,
                self.nof_symbols, self.dmrs_symbols,
                self.dmrs_cdm_groups_without_data, u.g_harq_ack,
                u.g_csi_part1, u.g_csi_part2, u.g_harq_ack_rvd)

    @functools.cached_property
    def uci_maps(self) -> dict:
        return ulsch.demux_positions(*self.uci_maps_key)

    @functools.cached_property
    def g_sch(self) -> int:
        """UL-SCH rate-matched length after UCI multiplexing (= nof_bits
        when no UCI rides the PUSCH; includes reserved/punctured bits)."""
        if not self.uci.any:
            return self.nof_bits
        return len(self.uci_maps["sch"])

    @functools.cached_property
    def cb_lengths(self) -> list[int]:
        return ldpc_params.rate_match_lengths(
            self.g_sch, self.segments.nof_segments, self.qm,
            self.nof_layers)

    @property
    def scrambling_cinit(self) -> int:
        return ((self.rnti << 15) + self.nid) % (1 << 31)

    def dmrs_cinit(self, symbol: int) -> int:
        return dmrs.dmrs_cinit(self.slot_in_frame, symbol, self.nid_dmrs,
                               self.n_scid)

    @functools.cached_property
    def dmrs_sc_indices(self) -> np.ndarray:
        return dmrs.type1_sc_indices(self.prb_start, self.nof_prb, delta=0)

    @functools.cached_property
    def symbol_plan(self) -> list[tuple[int, str]]:
        """(symbol, kind) in mapping order; kind ∈ {full, comb_data, dmrs}.

        The contiguous type-1 allocation lets every symbol be one slice of
        the grid — scatter/gather-free mapping (TPU-structured).
        """
        resv = dict(self.reserved_patterns)
        plan = []
        for l in range(self.first_symbol, self.first_symbol + self.nof_symbols):
            if l in self.dmrs_symbols:
                kind = ("comb_data"
                        if self.dmrs_cdm_groups_without_data < 2 else "dmrs")
            elif l in resv:
                kind = "reserved"
            else:
                kind = "full"
            plan.append((l, kind))
        return plan

    @functools.cached_property
    def reserved_keep_offsets(self) -> dict[int, tuple[int, ...]]:
        """symbol → kept (data) sc offsets within each PRB."""
        out = {}
        for l, offs in self.reserved_patterns:
            out[l] = tuple(k for k in range(NRE) if k not in set(offs))
        return out

    @property
    def sc_bounds(self) -> tuple[int, int]:
        return self.prb_start * NRE, (self.prb_start + self.nof_prb) * NRE

    @functools.cached_property
    def vrb_sc_maps(self) -> tuple[np.ndarray, np.ndarray]:
        """(fwd_sc, inv_sc): phys[fwd_sc[v]] = virt[v]; virt = phys[fwd_sc]
        gathers the receiver back to virtual (contiguous) order."""
        from ...ran import vrb_prb
        n_bwp = self.bwp_nof_prb or (self.prb_start + self.nof_prb)
        prb_map = vrb_prb.interleaved_vrb_to_prb(n_bwp, 2)
        fwd = (prb_map[:, None] * NRE + np.arange(NRE)[None, :]
               ).reshape(-1).astype(np.int32)
        inv = np.empty_like(fwd)
        inv[fwd] = np.arange(len(fwd), dtype=np.int32)
        return fwd, inv

    @functools.cached_property
    def time_weights(self) -> list[tuple[int, int, float]]:
        """Per-symbol (d0, d1, w1) linear time-interp coefficients between
        bracketing DM-RS symbols: h(l) = (1-w1)·h_dmrs[d0] + w1·h_dmrs[d1]
        (clamped extrapolation at slot edges, interpolator_linear_impl)."""
        ds = self.dmrs_symbols
        out = []
        for l in range(self.first_symbol,
                       self.first_symbol + self.nof_symbols):
            if l <= ds[0] or len(ds) == 1:
                out.append((0, 0, 0.0))
            elif l >= ds[-1]:
                out.append((len(ds) - 1, len(ds) - 1, 0.0))
            else:
                i = max(j for j in range(len(ds)) if ds[j] <= l)
                w1 = (l - ds[i]) / (ds[i + 1] - ds[i])
                out.append((i, i + 1, float(w1)))
        return out


def _dmrs_pilots(cfg: ShConfig) -> jnp.ndarray:
    """[ndmrs_sym, 6*nof_prb] pilot values (DM-RS port 0)."""
    cinits = jnp.asarray([cfg.dmrs_cinit(l) for l in cfg.dmrs_symbols],
                         dtype=jnp.uint32)
    return dmrs.pilot_values(cinits, cfg.prb_start, cfg.nof_prb)


def _dmrs_occ(cfg: ShConfig, layer: int) -> np.ndarray:
    """Frequency OCC w_f of DM-RS port `layer` over the pilot index
    (TS 38.211 Table 6.4.1.1.3-1: ports 1000/1002 [+1,+1], ports
    1001/1003 [+1,-1]; ports 1000/1001 ride CDM group 0 (comb 0),
    1002/1003 CDM group 1 (comb 1) — see `_dmrs_comb`)."""
    npil = 6 * cfg.nof_prb
    if layer % 2 == 0:
        return np.ones(npil, np.float32)
    return np.where(np.arange(npil) % 2 == 0, 1.0, -1.0).astype(np.float32)


def _dmrs_comb(layer: int) -> int:
    """CDM group (= comb index Δ) of DM-RS port `layer` (type 1)."""
    return 0 if layer < 2 else 1


def _encode_sch(tb_bits: jnp.ndarray, cfg: ShConfig,
                encoder_backend: str = "auto") -> jnp.ndarray:
    """TB bits → rate-matched SCH codeword bits [g_sch]."""
    seg = cfg.segments
    cbs = segmentation.segment_tx(tb_bits, seg)          # [C, K]
    if encoder_backend == "auto":
        encoder_backend = ("pallas" if jax.default_backend() not in ("cpu",)
                           else "xla")
    if encoder_backend == "pallas":
        cw = encoder_pallas.encode(cbs, seg.base_graph, seg.lifting_size)
    else:
        cw = encoder.encode(cbs, seg.base_graph, seg.lifting_size)
    return rate_match.match_tb(
        cw, seg.base_graph, seg.lifting_size, cfg.rv, seg.payload_length,
        seg.segment_length, tuple(cfg.cb_lengths), cfg.qm)    # [G], 1 gather


def map_res(syms: jnp.ndarray, cfg: ShConfig, grid: jnp.ndarray,
            pilots: jnp.ndarray | None = None,
            pilot_comb: int = 0) -> jnp.ndarray:
    """Structured slice-based RE mapping (no scatters): each symbol of the
    contiguous allocation is one row write; DM-RS symbols interleave the
    comb-2 pilots with data (CDM-1) or zeros (CDM-2).  Public so profilers
    measure exactly the production mapping."""
    lo, hi = cfg.sc_bounds
    width = hi - lo
    if pilots is None:
        pilots = _dmrs_pilots(cfg)                       # [ndmrs, width/2]
    dmrs_i = {l: i for i, l in enumerate(cfg.dmrs_symbols)}
    pos = 0
    for l, kind in cfg.symbol_plan:
        if kind == "full":
            row = syms[pos:pos + width]
            pos += width
        elif kind == "reserved":
            keep = cfg.reserved_keep_offsets[l]
            nk = len(keep)
            chunk = syms[pos:pos + cfg.nof_prb * nk]
            pos += cfg.nof_prb * nk
            block = jnp.zeros((cfg.nof_prb, NRE), syms.dtype)
            if keep == tuple(range(keep[0], keep[0] + nk)):
                # contiguous kept offsets (e.g. one reserved CSI-RS RE at
                # the PRB edge): slice update, no scatter (TPU)
                block = block.at[:, keep[0]:keep[0] + nk].set(
                    chunk.reshape(cfg.nof_prb, nk))
            else:
                block = block.at[:, jnp.asarray(keep)].set(
                    chunk.reshape(cfg.nof_prb, nk))
            row = block.reshape(width)
        elif kind == "comb_data":
            chunk = syms[pos:pos + width // 2]
            pos += width // 2
            row = jnp.stack([pilots[dmrs_i[l]], chunk], axis=-1).reshape(-1)
        else:  # dmrs only
            zero = jnp.zeros_like(pilots[dmrs_i[l]])
            pair = ([zero, pilots[dmrs_i[l]]] if pilot_comb
                    else [pilots[dmrs_i[l]], zero])
            row = jnp.stack(pair, axis=-1).reshape(-1)
        if cfg.vrb_to_prb_interleaved:
            # virtual (VRB) row → physical PRBs: one static scatter-free
            # gather of the full BWP row
            n_bwp_sc = len(cfg.vrb_sc_maps[0])
            virt = jnp.zeros((*row.shape[:-1], n_bwp_sc), row.dtype)
            virt = virt.at[..., lo:hi].set(row)
            phys = virt[..., cfg.vrb_sc_maps[1]]
            grid = grid.at[..., l, :n_bwp_sc].add(phys)
        else:
            grid = grid.at[..., l, lo:hi].set(row)
    return grid


def _scramble_modulate_map(codeword: jnp.ndarray, cfg: ShConfig,
                           grid: jnp.ndarray,
                           w: jnp.ndarray | None = None,
                           pilots: jnp.ndarray | None = None) -> jnp.ndarray:
    seq = jnp.asarray(_scramble_seq(cfg.scrambling_cinit, cfg.nof_bits))
    scrambled = codeword.astype(jnp.int8) ^ seq
    syms = modulation.modulate(scrambled, cfg.qm)        # [n_re]
    if cfg.nof_layers == 1:
        return map_res(syms, cfg, grid, pilots=pilots)
    # Spatial multiplexing: layer map (TS 38.211 §7.3.1.3), per-layer RE
    # mapping with OCC'd DM-RS, then precode layer planes onto antenna
    # ports (channel_precoder_avx2.cpp → one einsum).  DM-RS rides the
    # layer planes so pilots are precoded exactly like data.
    assert cfg.dmrs_cdm_groups_without_data >= 2, \
        "multi-layer mapping requires CDM groups without data = 2"
    assert grid.ndim == 3, "MIMO transmit needs a [port, nsym, nsc] grid"
    nports = grid.shape[0]
    lay = precoding.layer_map(syms, cfg.nof_layers)      # [L, n_re/L]
    base_pilots = pilots if pilots is not None else _dmrs_pilots(cfg)
    planes = []
    for l in range(cfg.nof_layers):
        occ = jnp.asarray(_dmrs_occ(cfg, l))
        plane = map_res(lay[l], cfg,
                        jnp.zeros(grid.shape[1:], grid.dtype),
                        pilots=base_pilots * occ,
                        pilot_comb=_dmrs_comb(l))
        planes.append(plane)
    if w is None and nports == cfg.nof_layers:
        # identity layer→port mapping: the layer planes ARE the port
        # planes — no precoding product at all
        return grid + jnp.stack(planes)
    layer_grids = jnp.stack(planes)                      # [L, nsym, nsc]
    if w is None:
        w = precoding.identity_precoder(nports, cfg.nof_layers)
    return grid + precoding.apply_precoding(
        layer_grids.reshape(cfg.nof_layers, -1), np.asarray(w)
    ).reshape(nports, *grid.shape[1:])


def symbol_check(demod: PuschDemod, codeword: jnp.ndarray) -> jnp.ndarray:
    """Fraction of codeword bits whose hard LLR decision matches.

    UE-side loopback verification of a DL shared channel WITHOUT an LDPC
    decode: `demod.sch_llr` already traversed TX mapping → OFDM → channel
    → estimation → equalization → demapping → descrambling, so a hard-bit
    match against the known codeword pins the whole symbol-level chain.
    (The gNB never decodes its own PDSCH — lib/phy/upper has no DL
    receiver — so this check stays out of the measured gNB slot budget
    narrative while still verifying every benched slot.)
    """
    hard = (demod.sch_llr < 0).astype(jnp.int8)
    return jnp.mean((hard == codeword.astype(jnp.int8)
                     ).astype(jnp.float32))


def symbol_verify(rx_grid: jnp.ndarray, tx_grid: jnp.ndarray,
                  cfg: ShConfig) -> tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """UE-side symbol-domain DL verification against the KNOWN tx grid.

    Estimates + equalizes the allocation exactly like pusch_demodulate,
    then compares each equalized data symbol against the transmitted
    constellation point (per-axis deviation < half the minimum distance ⇔
    the hard decision recovers the transmitted symbol, i.e. every one of
    its qm bits).  Equivalent in strength to the hard-bit codeword match
    (sch.symbol_check) at ~1/3 the device cost: the soft demapper,
    descrambler and rate-dematcher — all independently exercised by the
    measured UL path in the same program — drop out of the chain.

    tx_grid: [nsym, nsc] or [port, nsym, nsc] — the assembled DL grid
    (identity layer→port mapping, so port rows are layer symbols).
    Returns (symbol_match_fraction, evm_vs_ref, post_noise_var).
    """
    if rx_grid.ndim == 2:
        rx_grid = rx_grid[None]
    if tx_grid.ndim == 2:
        tx_grid = tx_grid[None]
    lo, hi = cfg.sc_bounds
    tx_pilots = _dmrs_pilots(cfg)
    rx_pilots = jnp.stack(
        [rx_grid[..., l, lo:hi][..., 0::2] for l in cfg.dmrs_symbols],
        axis=-2)

    def _keep_resv(x, l):
        keep = cfg.reserved_keep_offsets[l]
        nk = len(keep)
        blk = x.reshape(*x.shape[:-1], cfg.nof_prb, NRE)
        if keep == tuple(range(keep[0], keep[0] + nk)):
            kept = blk[..., keep[0]:keep[0] + nk]
        else:
            kept = blk[..., jnp.asarray(keep)]
        return kept.reshape(*x.shape[:-1], cfg.nof_prb * nk)

    def rows(grid, h_alloc=None):
        y_rows, h_rows = [], []
        for l, kind in cfg.symbol_plan:
            row = grid[..., l, lo:hi]
            if kind == "full":
                y_rows.append(row)
                if h_alloc is not None:
                    h_rows.append(h_alloc)
            elif kind == "reserved":
                y_rows.append(_keep_resv(row, l))
                if h_alloc is not None:
                    h_rows.append(_keep_resv(h_alloc, l))
            elif kind == "comb_data":
                y_rows.append(row[..., 1::2])
                if h_alloc is not None:
                    h_rows.append(h_alloc[..., 1::2])
        y = jnp.concatenate(y_rows, axis=-1)
        if h_alloc is None:
            return y
        return y, jnp.concatenate(h_rows, axis=-1)

    if cfg.nof_layers == 2:
        est = estimator.estimate_comb2_occ2(rx_pilots, tx_pilots)
        y, h = rows(rx_grid, est.h_alloc)
        noise_var = jnp.maximum(jnp.mean(est.noise_var), 1e-9)
        x_hat, nv = equalizer.zf_nx2(y, h, noise_var)      # [2, n_re]
        x_ref = rows(tx_grid[:2])
    else:
        est = estimator.estimate_comb2(rx_pilots, tx_pilots,
                                       time_interp=cfg.time_interp)
        y, h = rows(rx_grid, est.h_alloc)
        noise_var = jnp.maximum(jnp.mean(est.noise_var), 1e-9)
        x_hat, nv = equalizer.zf_1xn(y, h, noise_var)
        x_ref = rows(tx_grid[:1])[0]
    half_d = float({2: 1 / np.sqrt(2), 4: 1 / np.sqrt(10),
                    6: 1 / np.sqrt(42), 8: 1 / np.sqrt(170)}[cfg.qm])
    d = x_hat - x_ref
    hit = ((jnp.abs(d.real) < half_d) & (jnp.abs(d.imag) < half_d))
    match = jnp.mean(hit.astype(jnp.float32))
    evm = jnp.sqrt(jnp.mean(jnp.abs(d) ** 2))
    return match, evm, jnp.mean(nv)


def pdsch_transmit(tb_bits: jnp.ndarray, cfg: ShConfig,
                   grid: jnp.ndarray,
                   encoder_backend: str = "auto",
                   w: jnp.ndarray | None = None,
                   pilots: jnp.ndarray | None = None) -> jnp.ndarray:
    """Process one transport block onto a [nsym, nsc] (or [port, ...]) grid.

    w: optional [nof_ports, nof_layers] precoding matrix (identity layer→
    port mapping when None).  pilots: optional traced DM-RS reference
    (slot-independent compiled programs — see pusch_demodulate).
    """
    codeword = _encode_sch(tb_bits, cfg, encoder_backend)
    return _scramble_modulate_map(codeword, cfg, grid, w=w, pilots=pilots)


def pusch_transmit(tb_bits: jnp.ndarray, cfg: ShConfig, grid: jnp.ndarray,
                   ack_bits: jnp.ndarray | None = None,
                   csi1_bits: jnp.ndarray | None = None,
                   csi2_bits: jnp.ndarray | None = None,
                   encoder_backend: str = "auto",
                   pilots: jnp.ndarray | None = None) -> jnp.ndarray:
    """UL-SCH transmit with UCI multiplexing (UE-side / loopback TX).

    Mirrors pusch_processor semantics in reverse: data and encoded UCI
    fields are interleaved per TS 38.212 §6.2.7 before scrambling.
    """
    sch_bits = _encode_sch(tb_bits, cfg, encoder_backend)
    if not cfg.uci.any:
        return _scramble_modulate_map(sch_bits, cfg, grid, pilots=pilots)
    u = cfg.uci
    empty = jnp.zeros((0,), jnp.int8)
    ack = (ulsch.encode_uci_field(ack_bits, u.nof_harq_ack_bits,
                                  len(cfg.uci_maps["ack"]), cfg.qm)
           if u.nof_harq_ack_bits else empty)
    csi1 = (ulsch.encode_uci_field(csi1_bits, u.nof_csi_part1_bits,
                                   len(cfg.uci_maps["csi1"]), cfg.qm)
            if u.nof_csi_part1_bits else empty)
    csi2 = (ulsch.encode_uci_field(csi2_bits, u.nof_csi_part2_bits,
                                   len(cfg.uci_maps["csi2"]), cfg.qm)
            if u.nof_csi_part2_bits else empty)
    codeword = ulsch.multiplex(sch_bits, ack, csi1, csi2, cfg.uci_maps_key)
    return _scramble_modulate_map(codeword, cfg, grid, pilots=pilots)


@dataclasses.dataclass
class PuschResult:
    tb_bits: jnp.ndarray
    tb_crc_ok: jnp.ndarray
    cb_crc_ok: jnp.ndarray
    noise_var: jnp.ndarray
    rsrp: jnp.ndarray
    sinr_db: jnp.ndarray
    evm: jnp.ndarray | None = None
    # time alignment: delay in samples = ta_norm * nfft (per rx port mean)
    ta_norm: jnp.ndarray | None = None
    # UCI on PUSCH (empty arrays when not configured)
    ack_bits: jnp.ndarray | None = None
    ack_valid: jnp.ndarray | None = None
    csi1_bits: jnp.ndarray | None = None
    csi1_valid: jnp.ndarray | None = None
    csi2_bits: jnp.ndarray | None = None
    csi2_valid: jnp.ndarray | None = None


def evm_calculate(x_hat: jnp.ndarray, qm: int) -> jnp.ndarray:
    """RMS error-vector magnitude against the nearest constellation point
    (reference: evm_calculator_generic_impl.cpp — hard symbol reconstruct
    then RMS error)."""
    levels = jnp.asarray(modulation.pam_levels(qm)) if qm > 2 else \
        jnp.asarray(np.array([1, -1], np.float32) / np.sqrt(2.0))

    def nearest(axis_vals):
        d = jnp.abs(axis_vals[..., None] - levels)
        return levels[jnp.argmin(d, axis=-1)]

    hard = nearest(x_hat.real) + 1j * nearest(x_hat.imag)
    return jnp.sqrt(jnp.mean(jnp.abs(x_hat - hard) ** 2))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PuschDemod:
    """Output of the PUSCH front half (pre-LDPC)."""
    llr_full: jnp.ndarray          # [C, N_full*Zc] — HARQ-combinable
    noise_var: jnp.ndarray
    rsrp: jnp.ndarray
    evm: jnp.ndarray
    ack_llr: jnp.ndarray           # [G_ack] (empty when no UCI)
    csi1_llr: jnp.ndarray
    csi2_llr: jnp.ndarray
    # mean post-equalization noise variance (unit Es ⇒ SINR = 1/this);
    # captures rx-combining / MIMO separation gain, unlike rsrp/noise_var
    post_noise_var: jnp.ndarray | None = None
    ta_norm: jnp.ndarray | None = None
    # descrambled SCH LLRs in codeword order [g_sch], pre-dematch: lets a
    # UE-side loopback verify the TX+OFDM+equalizer chain by hard-bit
    # comparison against the known codeword without paying an LDPC decode
    sch_llr: jnp.ndarray | None = None

    # tuple-style unpacking kept for the pre-UCI callers/tests
    def __iter__(self):
        return iter((self.llr_full, self.noise_var, self.rsrp))

    def __getitem__(self, i):
        return (self.llr_full, self.noise_var, self.rsrp)[i]


def pusch_demodulate(rx_grid: jnp.ndarray, cfg: ShConfig,
                     tx_pilots: jnp.ndarray | None = None) -> PuschDemod:
    """Front half of the PUSCH receiver: grid → per-codeblock LLRs + UCI.

    The HARQ softbuffer combines llr_full across retransmissions before
    decoding (pusch_decode).  UCI field LLRs are demultiplexed per
    TS 38.212 §6.2.7 (pusch_processor_impl.cpp:259-279).

    tx_pilots: optional traced DM-RS reference ([ndmrs, 6*nof_prb],
    dmrs.pilot_values) — lets fused slot programs keep the slot number
    OUT of the compiled shape (slot_programs.py passes the per-slot
    cinit-derived pilots as data; default regenerates from cfg).
    """
    if rx_grid.ndim == 2:
        rx_grid = rx_grid[None]
    if cfg.vrb_to_prb_interleaved:
        # physical → virtual (contiguous VRB) order: one static gather,
        # after which the slice-structured chain below applies unchanged
        fwd = jnp.asarray(cfg.vrb_sc_maps[0])
        n_bwp_sc = fwd.shape[0]
        rx_grid = jnp.concatenate(
            [rx_grid[..., fwd], rx_grid[..., n_bwp_sc:]], axis=-1)

    # --- channel estimation from DM-RS (structured comb-2: slices only)
    lo, hi = cfg.sc_bounds
    if tx_pilots is None:
        tx_pilots = _dmrs_pilots(cfg)
    rx_pilots = jnp.stack(
        [rx_grid[..., l, lo:hi][..., 0::2] for l in cfg.dmrs_symbols],
        axis=-2)                                          # [nrx, ndmrs, npil]
    def _keep_resv(x, l):
        keep = cfg.reserved_keep_offsets[l]
        nk = len(keep)
        blk = x.reshape(*x.shape[:-1], cfg.nof_prb, NRE)
        if keep == tuple(range(keep[0], keep[0] + nk)):
            kept = blk[..., keep[0]:keep[0] + nk]
        else:
            kept = blk[..., jnp.asarray(keep)]
        return kept.reshape(*x.shape[:-1], cfg.nof_prb * nk)

    if cfg.nof_layers in (2, 4):
        # CDM-OCC despread → per-layer channel [nrx, L, width], then n×L
        # joint ZF per RE (equalize_zf_2x2.cpp generalized; L=4 adds CDM
        # group 1 on the odd comb and the Schur-block n×4 solver).
        est = estimator.estimate_comb2_occ2(rx_pilots, tx_pilots)
        if cfg.nof_layers == 4:
            rx_pilots_c1 = jnp.stack(
                [rx_grid[..., l, lo:hi][..., 1::2]
                 for l in cfg.dmrs_symbols], axis=-2)
            est1 = estimator.estimate_comb2_occ2(rx_pilots_c1, tx_pilots,
                                                 sc_offset=1)
            h_layers = jnp.concatenate([est.h_alloc, est1.h_alloc],
                                       axis=-2)           # [nrx, 4, w]
            nv_est = 0.5 * (jnp.mean(est.noise_var)
                            + jnp.mean(est1.noise_var))
        else:
            h_layers = est.h_alloc
            nv_est = jnp.mean(est.noise_var)
        y_rows, h_rows = [], []
        for l, kind in cfg.symbol_plan:
            if kind == "full":
                y_rows.append(rx_grid[..., l, lo:hi])
                h_rows.append(h_layers)
            elif kind == "reserved":
                y_rows.append(_keep_resv(rx_grid[..., l, lo:hi], l))
                h_rows.append(_keep_resv(h_layers, l))
            # else: CDM=2 DM-RS symbols carry no data
        y = jnp.concatenate(y_rows, axis=-1)              # [nrx, n_re]
        h = jnp.concatenate(h_rows, axis=-1)              # [nrx, L, n_re]
        noise_var = jnp.maximum(nv_est, 1e-9)
        eq = (equalizer.zf_nx4 if cfg.nof_layers == 4
              else equalizer.zf_nx2)
        x_lay, nv_lay = eq(y, h, noise_var)                # [L, n_re] each
        evm = evm_calculate(x_lay, cfg.qm)
        llr_lay = modulation.demodulate_soft(x_lay, nv_lay, cfg.qm)
        llr = precoding.layer_demap_llr(llr_lay, cfg.qm)  # [nof_bits]
        seq = jnp.asarray(1.0 - 2.0 * _scramble_seq(
            cfg.scrambling_cinit, cfg.nof_bits).astype(np.float32))
        llr = llr * seq
        llr = jnp.clip(llr, -float(LLR_MAX), float(LLR_MAX))
        if cfg.uci.any:
            sch_llr, ack_llr, csi1_llr, csi2_llr = ulsch.demultiplex(
                llr, cfg.uci_maps)
        else:
            sch_llr, ack_llr = llr, llr[:0]
            csi1_llr, csi2_llr = llr[:0], llr[:0]
        seg = cfg.segments
        full = rate_match.dematch_tb(
            sch_llr, seg.base_graph, seg.lifting_size, cfg.rv,
            seg.payload_length, seg.segment_length, tuple(cfg.cb_lengths),
            cfg.qm)
        return PuschDemod(llr_full=full, noise_var=noise_var,
                          rsrp=jnp.mean(est.rsrp), evm=evm,
                          ack_llr=ack_llr, csi1_llr=csi1_llr,
                          csi2_llr=csi2_llr,
                          post_noise_var=jnp.mean(nv_lay), sch_llr=sch_llr)
    est = estimator.estimate_comb2(rx_pilots, tx_pilots,
                                   time_interp=cfg.time_interp)

    def h_for_symbol(l: int) -> jnp.ndarray:
        if not cfg.time_interp:
            return est.h_alloc
        d0, d1, w1 = cfg.time_weights[l - cfg.first_symbol]
        h0 = est.h_dmrs[..., d0, :]
        if w1 == 0.0:
            return h0
        return (1.0 - w1) * h0 + w1 * est.h_dmrs[..., d1, :]

    # --- extract + equalize data REs, symbol rows in mapping order
    y_rows, h_rows = [], []
    for l, kind in cfg.symbol_plan:
        row = rx_grid[..., l, lo:hi]
        h_sym = h_for_symbol(l)
        if kind == "full":
            y_rows.append(row)
            h_rows.append(h_sym)
        elif kind == "reserved":
            y_rows.append(_keep_resv(row, l))
            h_rows.append(_keep_resv(h_sym, l))
        elif kind == "comb_data":
            y_rows.append(row[..., 1::2])
            h_rows.append(h_sym[..., 1::2])
    y = jnp.concatenate(y_rows, axis=-1)                  # [nrx, n_re]
    h = jnp.concatenate(h_rows, axis=-1)
    noise_var = jnp.maximum(jnp.mean(est.noise_var), 1e-9)
    x_hat, post_nv = equalizer.zf_1xn(y, h, noise_var)

    # --- demap + descramble (sign flip on scrambled positions)
    evm = evm_calculate(x_hat, cfg.qm)
    llr = modulation.demodulate_soft(x_hat, post_nv, cfg.qm)
    seq = jnp.asarray(1.0 - 2.0 * _scramble_seq(
        cfg.scrambling_cinit, cfg.nof_bits).astype(np.float32))
    llr = llr * seq
    llr = jnp.clip(llr, -float(LLR_MAX), float(LLR_MAX))  # int8 LLR domain
    llr = llr.reshape(-1)                                 # single-layer TB

    # --- UL-SCH demultiplex (UCI on PUSCH): four static gathers
    if cfg.uci.any:
        sch_llr, ack_llr, csi1_llr, csi2_llr = ulsch.demultiplex(
            llr, cfg.uci_maps)
    else:
        sch_llr, ack_llr = llr, llr[:0]
        csi1_llr, csi2_llr = llr[:0], llr[:0]

    # --- rate dematch: whole-TB inverse permutation, 1-2 gathers
    seg = cfg.segments
    full = rate_match.dematch_tb(
        sch_llr, seg.base_graph, seg.lifting_size, cfg.rv,
        seg.payload_length, seg.segment_length, tuple(cfg.cb_lengths),
        cfg.qm)                                           # [C, Nfull]
    return PuschDemod(llr_full=full, noise_var=noise_var,
                      rsrp=jnp.mean(est.rsrp), evm=evm, ack_llr=ack_llr,
                      csi1_llr=csi1_llr, csi2_llr=csi2_llr,
                      post_noise_var=jnp.mean(post_nv),
                      ta_norm=jnp.mean(est.ta_norm), sch_llr=sch_llr)


def pusch_decode(llr_full: jnp.ndarray, cfg: ShConfig,
                 noise_var: jnp.ndarray, rsrp: jnp.ndarray,
                 nof_ldpc_iterations: int = 6,
                 decoder_backend: str = "auto",
                 demod: PuschDemod | None = None) -> PuschResult:
    """Back half: combined LLRs → decoded TB + CRC + CSI (+ UCI decode)."""
    seg = cfg.segments
    if decoder_backend == "auto":
        decoder_backend = ("pallas" if jax.default_backend() not in ("cpu",)
                           else "xla")
    # rv=0 circular-buffer reads are contiguous: truncate the decoding
    # graph to the transmitted span (exact — see decoder_pallas._layers).
    # Retransmissions (rv>0) and HARQ-combined buffers wrap, so decode
    # the full graph.
    n_used = (decoder_pallas.used_blocks(seg.base_graph, seg.lifting_size,
                                         max(cfg.cb_lengths))
              if cfg.rv == 0 else None)
    if decoder_backend == "pallas":
        bits, ok = decoder_pallas.decode(llr_full, seg.base_graph,
                                         seg.lifting_size,
                                         nof_iterations=nof_ldpc_iterations,
                                         nof_used_blocks=n_used)
    else:
        bits, ok = decoder.decode(llr_full, seg.base_graph, seg.lifting_size,
                                  nof_iterations=nof_ldpc_iterations,
                                  nof_used_blocks=n_used)
    return pusch_finish(bits, ok, cfg, noise_var, rsrp, demod)


def pusch_finish(bits: jnp.ndarray, ok: jnp.ndarray, cfg: ShConfig,
                 noise_var: jnp.ndarray, rsrp: jnp.ndarray,
                 demod: PuschDemod | None = None) -> PuschResult:
    """Decoded codeblock bits → PuschResult (desegment + CRC + SINR + UCI).

    Split out of pusch_decode so fused slot programs can batch the LDPC
    decode ACROSS a slot's PDUs (phy/upper/slot_programs.py) and still
    share the result assembly."""
    seg = cfg.segments
    tb, tb_ok, cb_ok = segmentation.desegment_rx(bits, seg)
    tb_ok = tb_ok & jnp.all(ok)
    # Post-equalization SINR (EVM→SINR analogue, pusch_processor_impl.cpp):
    # unit symbol energy ⇒ SINR = 1/mean(post-eq noise var).  Falls back to
    # rsrp/noise_var when only combined-LLR HARQ state is available.
    if demod is not None and demod.post_noise_var is not None:
        sinr = 1.0 / jnp.maximum(demod.post_noise_var, 1e-12)
    else:
        sinr = rsrp / noise_var
    res = PuschResult(
        tb_bits=tb, tb_crc_ok=tb_ok, cb_crc_ok=cb_ok & ok,
        noise_var=noise_var, rsrp=rsrp,
        sinr_db=10.0 * jnp.log10(jnp.maximum(sinr, 1e-12)),
        evm=demod.evm if demod is not None else None,
        ta_norm=demod.ta_norm if demod is not None else None)
    if demod is not None and cfg.uci.any:
        u = cfg.uci
        if u.nof_harq_ack_bits:
            res.ack_bits, res.ack_valid = ulsch.decode_uci_field(
                demod.ack_llr, u.nof_harq_ack_bits, cfg.qm)
        if u.nof_csi_part1_bits:
            res.csi1_bits, res.csi1_valid = ulsch.decode_uci_field(
                demod.csi1_llr, u.nof_csi_part1_bits, cfg.qm)
        if u.nof_csi_part2_bits:
            res.csi2_bits, res.csi2_valid = ulsch.decode_uci_field(
                demod.csi2_llr, u.nof_csi_part2_bits, cfg.qm)
    return res


def llr_full_shape(cfg: ShConfig) -> tuple[int, int]:
    """Shape of PuschDemod.llr_full ([C codeblocks, N full buffer]) for a
    config — the HARQ softbuffer reservation size (the reference sizes
    rx_softbuffer codeblock pools the same way,
    rx_softbuffer_pool_impl.h:37-67).  N spans the full codeword INCLUDING
    the 2·Zc punctured systematic prefix (rate_match.dematch_tb zeroes
    it), i.e. 68·Zc / 52·Zc."""
    seg = cfg.segments
    return (seg.nof_segments,
            seg.full_codeblock_length + 2 * seg.lifting_size)


def pusch_receive(rx_grid: jnp.ndarray, cfg: ShConfig,
                  nof_ldpc_iterations: int = 6,
                  decoder_backend: str = "auto",
                  tx_pilots: jnp.ndarray | None = None) -> PuschResult:
    """Full PUSCH receiver (single transmission, no HARQ combining).

    decoder_backend: "pallas" (TPU kernel), "xla", or "auto" (pallas on
    TPU, xla elsewhere).
    """
    d = pusch_demodulate(rx_grid, cfg, tx_pilots=tx_pilots)
    return pusch_decode(d.llr_full, cfg, d.noise_var, d.rsrp,
                        nof_ldpc_iterations, decoder_backend, demod=d)
