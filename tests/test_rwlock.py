"""Reader-writer device lock: concurrency semantics for serving."""

import threading
import time

from classmate_rag_tpu.utils.rwlock import ReadWriteLock, read_scope, write_scope


def test_readers_overlap():
    lock = ReadWriteLock()
    barrier = threading.Barrier(3, timeout=10)
    oks = []

    def reader():
        with lock.read():
            barrier.wait()  # only passes if all 3 hold read simultaneously
            oks.append(1)

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=15)
    assert len(oks) == 3


def test_writer_excludes_readers():
    lock = ReadWriteLock()
    order = []
    in_write = threading.Event()
    release_write = threading.Event()

    def writer():
        with lock.write():
            in_write.set()
            release_write.wait(timeout=10)
            order.append("w")

    def reader():
        in_write.wait(timeout=10)
        with lock.read():
            order.append("r")

    tw = threading.Thread(target=writer)
    tr = threading.Thread(target=reader)
    tw.start()
    tr.start()
    time.sleep(0.1)            # reader must be blocked now
    assert order == []
    release_write.set()
    tw.join(timeout=10)
    tr.join(timeout=10)
    assert order == ["w", "r"]


def test_waiting_writer_blocks_new_readers():
    """Writer preference: a queued writer gets in before later readers."""
    lock = ReadWriteLock()
    order = []
    r1_in = threading.Event()
    r1_go = threading.Event()

    def reader1():
        with lock.read():
            r1_in.set()
            r1_go.wait(timeout=10)
        order.append("r1-out")

    def writer():
        r1_in.wait(timeout=10)
        with lock.write():
            order.append("w")

    def reader2():
        r1_in.wait(timeout=10)
        time.sleep(0.1)  # arrive after the writer queued
        with lock.read():
            order.append("r2")

    threads = [threading.Thread(target=f) for f in (reader1, writer, reader2)]
    for t in threads:
        t.start()
    time.sleep(0.3)
    r1_go.set()
    for t in threads:
        t.join(timeout=10)
    assert order == ["r1-out", "w", "r2"]


def test_scope_helpers_fall_back_to_plain_lock():
    plain = threading.Lock()
    with read_scope(plain):
        assert plain.locked()
    with write_scope(plain):
        assert plain.locked()
    rw = ReadWriteLock()
    with read_scope(rw):
        pass
    with write_scope(rw):
        pass
