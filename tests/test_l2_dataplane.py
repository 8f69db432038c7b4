"""L2 data-plane tests: support primitives, RLC TM/UM/AM, PDCP, SDAP,
GTP-U, F1-U, PCAP (mirrors the reference's tests/unittests/{rlc,pdcp,...}
strategy: loopback entities + lossy-channel stress)."""
import random
import struct

import pytest

from srsran_project_23_5_tpu import f1u, gtpu, pdcp, rlc, sdap
from srsran_project_23_5_tpu import security as sec
from srsran_project_23_5_tpu.pcap import DltPcap, MacPcap
from srsran_project_23_5_tpu.support import (ManualTaskWorker, TaskWorker,
                                             TaskWorkerPool, TimerManager)


# ------------------------------------------------------------------ support
def test_task_worker_fifo():
    w = TaskWorker("t")
    out = []
    for i in range(100):
        w.execute(lambda i=i: out.append(i))
    w.wait_idle()
    assert out == list(range(100))
    w.stop()


def test_task_worker_pool():
    p = TaskWorkerPool(4, "p")
    out = []
    import threading
    lock = threading.Lock()
    for i in range(200):
        p.execute(lambda i=i: (lock.acquire(), out.append(i),
                               lock.release()))
    p.wait_idle()
    assert sorted(out) == list(range(200))
    p.stop()


def test_manual_task_worker():
    m = ManualTaskWorker()
    out = []
    m.execute(lambda: out.append(1))
    assert out == [] and m.has_pending_tasks()
    assert m.run_pending_tasks() == 1
    assert out == [1]


def test_timers():
    tm = TimerManager()
    fired = []
    t = tm.create_timer()
    t.set(5, lambda: fired.append(tm.now))
    t.run()
    tm.tick(4)
    assert not fired and t.is_running()
    tm.tick(1)
    assert fired == [5] and not t.is_running()
    t.run()          # re-arm
    tm.tick(5)
    assert fired == [5, 10]


# --------------------------------------------------------------------- pcap
def test_mac_pcap(tmp_path):
    fn = str(tmp_path / "mac.pcap")
    p = MacPcap(fn)
    p.push_pdu(b"\x42\x00\x01\x02", rnti=0x4601, direction=1, harq_id=2)
    p.close()
    raw = open(fn, "rb").read()
    magic, _, _, _, _, _, dlt = struct.unpack_from("<IHHiIII", raw)
    assert magic == 0xA1B2C3D4 and dlt == 149
    assert b"mac-nr" in raw and b"\x42\x00\x01\x02" in raw


def test_dlt_pcap(tmp_path):
    fn = str(tmp_path / "f1ap.pcap")
    p = DltPcap(fn, 154)
    p.push_pdu(b"\x00\x01\x02")
    p.close()
    raw = open(fn, "rb").read()
    assert struct.unpack_from("<IHHiIII", raw)[6] == 154
    assert raw[-3:] == b"\x00\x01\x02"


# ---------------------------------------------------------------------- RLC
def test_rlc_tm():
    rx_sdus = []
    tx, rx = rlc.RlcTmTx(), rlc.RlcTmRx(rx_sdus.append)
    tx.handle_sdu(b"hello")
    assert tx.pull_pdu(3) == b""          # TM cannot segment
    pdu = tx.pull_pdu(100)
    rx.handle_pdu(pdu)
    assert rx_sdus == [b"hello"]
    assert tx.buffer_state() == 0


@pytest.mark.parametrize("sn_size", [6, 12])
def test_rlc_um_segmentation(sn_size):
    rx_sdus = []
    tx = rlc.RlcUmTx(sn_size=sn_size)
    rx = rlc.RlcUmRx(rx_sdus.append, sn_size=sn_size)
    sdus = [bytes([i]) * (10 + 37 * i) for i in range(8)]
    for s in sdus:
        tx.handle_sdu(s)
    pdus = []
    while tx.buffer_state():
        pdu = tx.pull_pdu(40)
        assert pdu
        pdus.append(pdu)
    for p in pdus:
        rx.handle_pdu(p)
    assert rx_sdus == sdus


def test_rlc_um_out_of_order_segments():
    rx_sdus = []
    tx = rlc.RlcUmTx()
    rx = rlc.RlcUmRx(rx_sdus.append)
    tx.handle_sdu(bytes(range(100)))
    pdus = []
    while tx.buffer_state():
        pdus.append(tx.pull_pdu(30))
    random.Random(0).shuffle(pdus)
    for p in pdus:
        rx.handle_pdu(p)
    assert rx_sdus == [bytes(range(100))]


def _am_pair(timers=None, **kw):
    cfg = rlc.RlcAmConfig(**kw)
    a_rx, b_rx = [], []
    a = rlc.RlcAmEntity(cfg, a_rx.append, timers)
    b = rlc.RlcAmEntity(cfg, b_rx.append, timers)
    return a, b, a_rx, b_rx


def test_rlc_am_basic_exchange():
    a, b, a_rx, b_rx = _am_pair()
    sdus = [bytes([i]) * (20 + i) for i in range(10)]
    for s in sdus:
        a.handle_sdu(s)
    # a → b
    for _ in range(100):
        pdu = a.pull_pdu(100)
        if not pdu:
            break
        b.handle_pdu(pdu)
    assert b_rx == sdus
    # b sends status back → a empties its window
    status = b.pull_pdu(100)
    assert status and rlc.pdu.is_control_pdu(status)
    a.handle_pdu(status)
    assert a.tx_next_ack == a.tx_next
    assert not a._tx_window


def test_rlc_am_loss_and_retx():
    tm = TimerManager()
    a, b, a_rx, b_rx = _am_pair(timers=tm, poll_pdu=2)
    sdus = [bytes([i]) * 50 for i in range(6)]
    for s in sdus:
        a.handle_sdu(s)
    # drop every 3rd PDU on first transmission
    i = 0
    for _ in range(50):
        pdu = a.pull_pdu(80)
        if not pdu:
            break
        if i % 3 != 2:
            b.handle_pdu(pdu)
        i += 1
    tm.tick(40)      # t-Reassembly expiry → status required
    # exchange status + retx until delivered; tick so t-PollRetransmit can
    # recover PDUs whose loss the receiver never saw (tail loss)
    for _ in range(30):
        st = b.pull_pdu(200)
        if st:
            a.handle_pdu(st)
        pdu = a.pull_pdu(80)
        if pdu:
            b.handle_pdu(pdu)
        tm.tick(50)
    assert b_rx == sdus


def test_rlc_am_segment_retx_with_so():
    tm = TimerManager()
    a, b, _, b_rx = _am_pair(timers=tm)
    a.handle_sdu(bytes(range(200)))
    pdus = []
    while True:
        p = a.pull_pdu(60)
        if not p:
            break
        pdus.append(p)
    assert len(pdus) >= 3
    # lose the middle segment
    for j, p in enumerate(pdus):
        if j != 1:
            b.handle_pdu(p)
    tm.tick(40)
    st = b.pull_pdu(100)
    a.handle_pdu(st)
    retx = a.pull_pdu(100)
    assert retx
    b.handle_pdu(retx)
    assert b_rx == [bytes(range(200))]


def test_rlc_am_max_retx_notifies():
    tm = TimerManager()
    cfg = rlc.RlcAmConfig(max_retx_threshold=2, poll_pdu=1)
    hit = []
    a = rlc.RlcAmEntity(cfg, lambda s: None, tm,
                        on_max_retx=lambda: hit.append(1))
    a.handle_sdu(b"x" * 10)
    a.pull_pdu(100)
    for _ in range(5):
        tm.tick(cfg.t_poll_retransmit + 1)   # t-PollRetransmit keeps firing
        a.pull_pdu(100)
    assert hit


# --------------------------------------------------------------------- PDCP
@pytest.mark.skipif(not sec.available(), reason="crypto lib unavailable")
@pytest.mark.parametrize("sn_size", [12, 18])
def test_pdcp_ciphered_integrity_roundtrip(sn_size):
    ctx = sec.SecurityContext(bytes(32))
    cfg_gnb = pdcp.PdcpConfig(sn_size=sn_size, is_srb=True, integrity=True,
                              direction=1)
    cfg_ue = pdcp.PdcpConfig(sn_size=sn_size, is_srb=True, integrity=True,
                             direction=0)
    wire_dl, ue_rx = [], []
    gnb_tx = pdcp.PdcpTx(cfg_gnb, ctx, wire_dl.append)
    ue_rxe = pdcp.PdcpRx(cfg_ue, ctx, ue_rx.append)
    sdus = [bytes([i]) * 30 for i in range(5)]
    for s in sdus:
        gnb_tx.handle_sdu(s)
    assert all(s not in w for s, w in zip(sdus, wire_dl))  # ciphered
    for w in wire_dl:
        ue_rxe.handle_pdu(w)
    assert ue_rx == sdus


@pytest.mark.skipif(not sec.available(), reason="crypto lib unavailable")
def test_pdcp_integrity_failure_detected():
    ctx = sec.SecurityContext(bytes(32))
    bad = []
    tx = pdcp.PdcpTx(pdcp.PdcpConfig(is_srb=True, integrity=True,
                                     direction=1), ctx,
                     lambda p: rx.handle_pdu(p[:-1] + bytes([p[-1] ^ 1])))
    rx = pdcp.PdcpRx(pdcp.PdcpConfig(is_srb=True, integrity=True,
                                     direction=0), ctx,
                     lambda s: pytest.fail("tampered SDU delivered"),
                     on_integrity_failure=bad.append)
    tx.handle_sdu(b"secret")
    assert bad == [0]


def test_pdcp_reordering():
    tm = TimerManager()
    rx_sdus = []
    cfg = pdcp.PdcpConfig(ciphering=False, t_reordering=10, direction=0)
    wire = []
    tx = pdcp.PdcpTx(pdcp.PdcpConfig(ciphering=False, direction=1), None,
                     wire.append)
    rx = pdcp.PdcpRx(cfg, None, rx_sdus.append, tm)
    for i in range(4):
        tx.handle_sdu(bytes([i]))
    rx.handle_pdu(wire[0])
    rx.handle_pdu(wire[2])          # hole at 1
    rx.handle_pdu(wire[3])
    assert rx_sdus == [b"\x00"]
    rx.handle_pdu(wire[1])          # hole fills → in-order flush
    assert rx_sdus == [b"\x00", b"\x01", b"\x02", b"\x03"]


def test_pdcp_reordering_timer_flush():
    tm = TimerManager()
    rx_sdus = []
    wire = []
    tx = pdcp.PdcpTx(pdcp.PdcpConfig(ciphering=False, direction=1), None,
                     wire.append)
    rx = pdcp.PdcpRx(pdcp.PdcpConfig(ciphering=False, t_reordering=10,
                                     direction=0), None, rx_sdus.append, tm)
    for i in range(3):
        tx.handle_sdu(bytes([i]))
    rx.handle_pdu(wire[2])          # only the last arrives
    tm.tick(11)
    assert rx_sdus == [b"\x02"]     # flushed at expiry


# --------------------------------------------------------------- SDAP/GTP-U
def test_sdap_mapping():
    dl, ul = [], []
    e = sdap.SdapEntity(sdap.SdapConfig(), lambda d, p: dl.append((d, p)),
                        lambda q, s: ul.append((q, s)))
    e.add_mapping(qfi=9, drb_id=2)
    e.handle_dl_sdu(b"ip-packet", qfi=9)
    assert dl == [(2, b"ip-packet")]
    e.handle_ul_pdu(b"up-packet", drb_id=2)
    assert ul == [(9, b"up-packet")]


def test_gtpu_roundtrip():
    h = gtpu.GtpuHeader(teid=0x1234, qfi=9, seq=7)
    wire = gtpu.encode(h, b"payload")
    h2, payload = gtpu.decode(wire)
    assert (h2.teid, h2.qfi, h2.seq, payload) == (0x1234, 9, 7, b"payload")
    # no options
    wire2 = gtpu.encode(gtpu.GtpuHeader(teid=5), b"x")
    h3, p3 = gtpu.decode(wire2)
    assert h3.teid == 5 and h3.qfi is None and p3 == b"x"


def test_gtpu_demux():
    got = []
    d = gtpu.GtpuDemux()
    d.add_tunnel(42, lambda h, p: got.append(p))
    tx = gtpu.GtpuTunnelTx(42, lambda w: d.handle_pdu(w), qfi=1)
    tx.handle_sdu(b"data")
    assert got == [b"data"]
    assert not d.handle_pdu(gtpu.encode(gtpu.GtpuHeader(99), b"z"))


def test_f1u_local_connector():
    cu, du = f1u.create_local_connector()
    got = []
    du.on_rx = got.append
    cu.transmit(b"pdcp-pdu")
    assert got == [b"pdcp-pdu"]
    assert du.highest_delivered == 0


# ------------------------------------------------------ full-chain stress
@pytest.mark.skipif(not sec.available(), reason="crypto lib unavailable")
def test_full_dl_chain_over_lossy_mac():
    """GTP-U → SDAP → PDCP(NEA2+NIA2) → RLC AM over a 20%-lossy MAC;
    everything must arrive in order (integration-test style, like the
    reference's tests/integrationtests/rlc stress)."""
    tm = TimerManager()
    ctx = sec.SecurityContext(b"\x11" * 32)
    rng = random.Random(7)
    delivered = []
    amcfg = rlc.RlcAmConfig(poll_pdu=4)
    rlc_ue = rlc.RlcAmEntity(amcfg, lambda p: pdcp_ue.handle_pdu(p), tm)
    rlc_gnb = rlc.RlcAmEntity(amcfg, lambda p: None, tm)
    pdcp_gnb = pdcp.PdcpTx(pdcp.PdcpConfig(direction=1, integrity=True),
                           ctx, rlc_gnb.handle_sdu)
    pdcp_ue = pdcp.PdcpRx(pdcp.PdcpConfig(direction=0, integrity=True),
                          ctx, delivered.append, tm)
    sd = sdap.SdapEntity(sdap.SdapConfig(),
                         lambda drb, p: pdcp_gnb.handle_sdu(p),
                         lambda q, s: None)
    sd.add_mapping(qfi=9, drb_id=1)
    demux = gtpu.GtpuDemux()
    demux.add_tunnel(0x100, lambda h, p: sd.handle_dl_sdu(p, h.qfi or 9))
    ngu_tx = gtpu.GtpuTunnelTx(0x100, demux.handle_pdu, qfi=9)

    packets = [bytes([rng.randrange(256)
                      for _ in range(rng.randrange(40, 1400))])
               for _ in range(30)]
    for pkt in packets:
        ngu_tx.handle_sdu(pkt)
    for _ in range(3000):
        p = rlc_gnb.pull_pdu(120)
        if p and rng.random() >= 0.2:
            rlc_ue.handle_pdu(p)
        st = rlc_ue.pull_pdu(300)
        if st:
            rlc_gnb.handle_pdu(st)
        tm.tick(3)
        if len(delivered) == len(packets):
            break
    assert delivered == packets
