"""Config, Welch-Berlekamp fallback decoder, MiMC-Jubjub PKC, sequencer,
task pool (misc reference-parity surfaces)."""

import asyncio
import json

import pytest

from honeybadgermpc_tpu.config import Algorithm, HbmpcConfig
from honeybadgermpc_tpu.ops.limbs import P
from honeybadgermpc_tpu.ops.welch_berlekamp import (make_wb_encoder_decoder,
                                                    wb_decode)
from honeybadgermpc_tpu.utils.sequencer import Sequencer
from honeybadgermpc_tpu.utils.task_pool import TaskPool


def test_config_load(tmp_path):
    cfg = {"N": 4, "t": 1, "my_id": 2,
           "peers": ["10.0.0.1:7001", "10.0.0.2:7002", "10.0.0.3:7003",
                     "10.0.0.4:7004"],
           "skip_preprocessing": True,
           "extra": {"k": 512},
           "reconstruction": {"induce_faults": True,
                              "decoding_algorithm": "welch-berlekamp"}}
    f = tmp_path / "conf.json"
    f.write_text(json.dumps(cfg))
    HbmpcConfig.load_config(["-d", "-f", str(f)])
    assert HbmpcConfig.N == 4 and HbmpcConfig.my_id == 2
    assert HbmpcConfig.peers[1] == ("10.0.0.2", 7002)
    assert HbmpcConfig.skip_preprocessing
    assert HbmpcConfig.extras["k"] == 512
    assert HbmpcConfig.reconstruction.induce_faults
    assert HbmpcConfig.reconstruction.decoding_algorithm == \
        Algorithm.WELCH_BERLEKAMP


def test_wb_decode_with_errors(rng):
    k, e = 3, 2
    n = k + 2 * e
    coeffs = [rng.randrange(P) for _ in range(k)]
    xs = list(range(1, n + 1))
    ys = [sum(c * pow(x, i, P) for i, c in enumerate(coeffs)) % P for x in xs]
    ys[1] = (ys[1] + 7) % P
    ys[4] = (ys[4] + 99) % P
    got = wb_decode(xs, ys, k)
    assert got == coeffs
    # too many errors -> None or wrong; flag only
    ys[0] = (ys[0] + 1) % P
    ys[2] = (ys[2] + 1) % P
    got2 = wb_decode(xs, ys, k)
    assert got2 is None or got2 != coeffs


def test_wb_encoder_decoder_api(rng):
    n, k = 7, 3
    enc, dec, _ = make_wb_encoder_decoder(n, k, P)
    msg = [rng.randrange(P) for _ in range(k)]
    encoded = enc(msg)
    encoded[3] = (encoded[3] + 5) % P       # one error
    encoded[6] = None                       # one erasure
    assert dec(encoded) == msg


def test_sequencer_ordering():
    s = Sequencer()
    s.add((2, "c"))
    s.add((0, "a"))
    assert s.is_next_available()
    assert s.get() == (0, "a")
    assert not s.is_next_available()
    s.add((1, "b"))
    assert s.get() == (1, "b")
    assert s.get() == (2, "c")
    with pytest.raises(AssertionError):
        s.add((1, "dup"))


def test_task_pool_bounded():
    async def run():
        active = 0
        peak = 0

        async def work():
            nonlocal active, peak
            active += 1
            peak = max(peak, active)
            await asyncio.sleep(0.01)
            active -= 1
            return 1

        pool = TaskPool(3)
        for _ in range(10):
            pool.submit(work())
        await pool.close()
        return peak

    peak = asyncio.run(run())
    assert peak <= 3


def test_mimc_jubjub_pkc(rng):
    from honeybadgermpc_tpu.models.mimc_jubjub_pkc import (key_generation,
                                                           mimc_decrypt,
                                                           mimc_encrypt)
    from honeybadgermpc_tpu.runtime.context import MpcContext
    from honeybadgermpc_tpu.runtime.preprocessing import PreProcessedElements
    n, t = 4, 1
    pre = PreProcessedElements(n, t, seed=61)
    pre.generate_triples(4096)
    pre.generate_rands(512)
    pre.generate_bits(64)
    ctx = MpcContext(n, t, preproc=pre)
    priv_bits, pub = key_generation(ctx, key_bits=8)
    msgs = [rng.randrange(P) for _ in range(3)]
    kg, cts = mimc_encrypt(pub, msgs, ephemeral_key=rng.randrange(1, 1 << 16))
    got = mimc_decrypt(ctx, priv_bits, kg, cts)
    assert got == msgs
