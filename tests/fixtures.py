"""Synthetic SensorEvent fixtures (FIXTURES.md §A shapes)."""

from __future__ import annotations

import hashlib
from typing import Any


def make_metric(i: int = 0, ts: str = "25/01/31-04:15:06.927463", **over: Any) -> dict:
    m: dict[str, Any] = {
        "snort_timestamp": ts,
        "snort_base64_data": f"cGt0{i}",
        "snort_dst_address": f"10.0.0.{i % 250}",
        "snort_dst_ap": f"10.0.0.{i % 250}:80",
        "snort_eth_dst": "aa:bb:cc:dd:ee:ff",
        "snort_eth_src": "11:22:33:44:55:66",
        "snort_eth_type": "0x800",
        "snort_pkt_gen": "raw",
        "snort_src_address": f"192.168.1.{i % 250}",
        "snort_src_ap": f"192.168.1.{i % 250}:1234",
        "snort_target": None,
        "snort_tcp_flags": "S" if i % 2 == 0 else None,
        "snort_client_bytes": 100 + i,
        "snort_client_pkts": 2,
        "snort_dst_port": 80,
        "snort_eth_len": 60 + i,
        "snort_flowstart_time": 1738296900 + i,
        "snort_geneve_vni": None,
        "snort_icmp_code": None,
        "snort_icmp_id": None,
        "snort_icmp_seq": None,
        "snort_icmp_type": None,
        "snort_ip_id": 1000 + i,
        "snort_ip_length": 40,
        "snort_mpls": None,
        "snort_pkt_length": 60 + i,
        "snort_pkt_number": i,
        "snort_server_bytes": 0,
        "snort_server_pkts": 0,
        "snort_sgt": None,
        "snort_tcp_ack": 0,
        "snort_tcp_len": 0,
        "snort_tcp_seq": 12345 + i,
        "snort_tcp_win": 1024,
        "snort_time_to_live": 64,
        "snort_udp_length": None,
        "snort_vlan": None,
    }
    m.update(over)
    return m


def make_sensor_event(
    event_id: int = 0, n_metrics: int = 3, **over: Any
) -> dict:
    payload = f"event-{event_id}"
    e: dict[str, Any] = {
        "metrics": [make_metric(i) for i in range(n_metrics)],
        "event_hash_sha256": hashlib.sha256(payload.encode()).hexdigest(),
        "event_metrics_count": n_metrics,
        "event_seconds": 1738296906,
        "sensor_id": f"sensor-{event_id % 3}",
        "sensor_version": "3.1.0",
        "event_read_at": 1738296906927463,
        "event_sent_at": 1738296906937463,
        "event_received_at": 1738296906947463,
        "snort_action": "allow",
        "snort_classification": "attempted-recon",
        "snort_direction": "C2S",
        "snort_interface": "eth0",
        "snort_message": f"test alert {event_id}",
        "snort_priority": (event_id % 4) + 1,
        "snort_protocol": "TCP",
        "snort_rule_gid": 1,
        "snort_rule_rev": 3,
        "snort_rule_sid": 1000000 + event_id,
        "snort_rule": f"1:{1000000 + event_id}:3",
        "snort_seconds": 1738296906,
        "snort_service": "http",
        "snort_type_of_service": 0,
    }
    e.update(over)
    return e
