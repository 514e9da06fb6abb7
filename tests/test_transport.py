"""UDP RobotIO transport: codec round trips, in-process driver/server
bridge, reordering protection, and stats exchange. (The two-process proof
runs via ``examples/realtime_demo.py --udp``.)"""

import time

import numpy as np

from soccerdiffusion_tpu.inference.realtime import SimulatedRobotIO
from soccerdiffusion_tpu.inference.transport import (
    UdpRobotIO,
    UdpRobotServer,
    decode_command,
    decode_observation,
    encode_command,
    encode_observation,
)


class TestCodec:
    def test_observation_round_trip(self):
        joints = np.arange(8, dtype=np.float32)
        imu = np.asarray([0.0, 0.0, 0.0, 1.0], np.float32)
        seq, j, i, gs = decode_observation(encode_observation(7, joints, imu, 2))
        assert seq == 7 and gs == 2
        np.testing.assert_array_equal(j, joints)
        np.testing.assert_array_equal(i, imu)

    def test_command_round_trip(self):
        cmd = np.linspace(-1, 1, 20).astype(np.float32)
        seq, decoded = decode_command(encode_command(3, cmd))
        assert seq == 3
        np.testing.assert_array_equal(decoded, cmd)


class TestBridge:
    def test_bidirectional_exchange(self):
        plant = SimulatedRobotIO(num_joints=8)
        server = UdpRobotServer(plant, "127.0.0.1:0", rate_hz=200.0)
        io = UdpRobotIO(f"127.0.0.1:{server.local_addr[1]}", timeout_s=5.0)
        try:
            import threading

            t = threading.Thread(target=server.serve, args=(None, 2.0), daemon=True)
            t.start()
            assert io.wait_connected(), "no observation within timeout"
            # observations carry the plant's state
            js = io.read_joint_state()
            assert js is not None and js.shape == (8,)
            assert io.read_imu().shape == (4,)
            assert io.read_game_state() == 2
            # commands reach the plant across the socket
            for k in range(20):
                io.write_command(np.full(8, 0.1 * k, np.float32))
            deadline = time.monotonic() + 2.0
            while server.commands_received < 20 and time.monotonic() < deadline:
                time.sleep(0.01)
            assert server.commands_received == 20
            assert plant.commands_received == 20
            # stats round trip
            assert io.request_stats() == 20
            # the plant moved toward the last command
            assert abs(plant.positions[0] - 1.9) < 1.9
        finally:
            io.close()
            server.close()

    def test_stale_reads_return_latest(self):
        plant = SimulatedRobotIO(num_joints=4)
        server = UdpRobotServer(plant, "127.0.0.1:0", rate_hz=100.0)
        io = UdpRobotIO(f"127.0.0.1:{server.local_addr[1]}", timeout_s=5.0)
        try:
            import threading

            threading.Thread(target=server.serve, args=(None, 0.5),
                             daemon=True).start()
            assert io.wait_connected()
            a = io.read_joint_state()
            b = io.read_joint_state()  # no new packet needed
            np.testing.assert_array_equal(a, b)
        finally:
            io.close()
            server.close()

    def test_reordered_observation_dropped(self):
        io = UdpRobotIO("127.0.0.1:1", timeout_s=0.1)
        try:
            # inject packets directly into the receive socket
            import socket

            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            port = io.local_addr[1]
            imu = np.zeros(4, np.float32)
            tx.sendto(encode_observation(5, np.full(4, 5.0, np.float32), imu, 1),
                      ("127.0.0.1", port))
            deadline = time.monotonic() + 2.0
            while io.read_joint_state() is None and time.monotonic() < deadline:
                time.sleep(0.01)
            # an OLDER seq must not overwrite the newer state
            tx.sendto(encode_observation(3, np.full(4, 3.0, np.float32), imu, 1),
                      ("127.0.0.1", port))
            time.sleep(0.2)
            np.testing.assert_array_equal(io.read_joint_state(),
                                          np.full(4, 5.0, np.float32))
            assert io.observations_received == 1
            tx.close()
        finally:
            io.close()
