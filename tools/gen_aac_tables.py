#!/usr/bin/env python3
"""Extract the AAC constant tables needed for the DAB+ encoder from the
reference fdk-aac sources into .npz (the tables are MPEG-4 / ETSI standard
data: scalefactor-band widths for the 960 transform, spectral Huffman
codebooks, scalefactor codebook).

Usage: python tools/gen_aac_tables.py [REFERENCE_DIR]
Writes: odr_audioenc_tpu/data/aac_tables.npz

Parsed (read-only):
  libAACenc/src/psy_configuration.cpp  (sfb widths 960/120)
  libAACenc/src/aacEnc_rom.cpp         (huffman ltab/ctab)
"""
import re
import sys
import numpy as np
from pathlib import Path

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference") / "fdk-aac"
OUT = Path(__file__).resolve().parent.parent / "odr_audioenc_tpu" / "data" / "aac_tables.npz"


def strip_comments(s):
    s = re.sub(r"/\*.*?\*/", "", s, flags=re.S)
    return re.sub(r"//[^\n]*", "", s)


def extract(src, decl, count, dtype=np.int64):
    i = src.index(decl)
    j = src.index("{", i)
    depth = 0
    for k in range(j, len(src)):
        if src[k] == "{":
            depth += 1
        elif src[k] == "}":
            depth -= 1
            if depth == 0:
                break
    body = src[j:k + 1]
    vals = [int(x, 0) for x in re.findall(r"0[xX][0-9a-fA-F]+|\d+", body)]
    assert len(vals) == count, f"{decl}: {len(vals)} != {count}"
    return np.asarray(vals, dtype)


def main():
    tables = {}
    psy = strip_comments((REF / "libAACenc/src/psy_configuration.cpp").read_text())
    # long 960 tables: first value is sfbCnt, then widths
    for rate in [16000, 22050, 24000, 32000, 44100, 48000]:
        i = psy.index(f"p_FDKaacEnc_{rate}_long_960")
        j = psy.index("{", i)
        nums = [int(x) for x in re.findall(r"\d+", psy[j:psy.index(";", j)])]
        cnt = nums[0]
        tables[f"sfb_long_{rate}"] = np.asarray(nums[1:1 + cnt], np.int32)
        i = psy.index(f"p_FDKaacEnc_{rate}_short_120")
        j = psy.index("{", i)
        nums = [int(x) for x in re.findall(r"\d+", psy[j:psy.index(";", j)])]
        cnt = nums[0]
        tables[f"sfb_short_{rate}"] = np.asarray(nums[1:1 + cnt], np.int32)

    rom = strip_comments((REF / "libAACenc/src/aacEnc_rom.cpp").read_text())
    # packed length tables: hi 16 bits = odd book, lo = even book
    l12 = extract(rom, "FDKaacEnc_huff_ltab1_2", 81).reshape(3, 3, 3, 3)
    l34 = extract(rom, "FDKaacEnc_huff_ltab3_4", 81).reshape(3, 3, 3, 3)
    l56 = extract(rom, "FDKaacEnc_huff_ltab5_6", 81).reshape(9, 9)
    l78 = extract(rom, "FDKaacEnc_huff_ltab7_8", 64).reshape(8, 8)
    l910 = extract(rom, "FDKaacEnc_huff_ltab9_10", 169).reshape(13, 13)
    tables["huff_len1"] = (l12 >> 16).astype(np.int32)
    tables["huff_len2"] = (l12 & 0xFFFF).astype(np.int32)
    tables["huff_len3"] = (l34 >> 16).astype(np.int32)
    tables["huff_len4"] = (l34 & 0xFFFF).astype(np.int32)
    tables["huff_len5"] = (l56 >> 16).astype(np.int32)
    tables["huff_len6"] = (l56 & 0xFFFF).astype(np.int32)
    tables["huff_len7"] = (l78 >> 16).astype(np.int32)
    tables["huff_len8"] = (l78 & 0xFFFF).astype(np.int32)
    tables["huff_len9"] = (l910 >> 16).astype(np.int32)
    tables["huff_len10"] = (l910 & 0xFFFF).astype(np.int32)
    tables["huff_len11"] = extract(rom, "FDKaacEnc_huff_ltab11", 289,
                                   np.int32).reshape(17, 17)
    tables["huff_lenscf"] = extract(rom, "FDKaacEnc_huff_ltabscf", 121, np.int32)
    shapes = {1: 81, 2: 81, 3: 81, 4: 81, 5: 81, 6: 81, 7: 64, 8: 64,
              9: 169, 10: 169, 11: 357}
    dims = {1: (3, 3, 3, 3), 2: (3, 3, 3, 3), 3: (3, 3, 3, 3), 4: (3, 3, 3, 3),
            5: (9, 9), 6: (9, 9), 7: (8, 8), 8: (8, 8), 9: (13, 13),
            10: (13, 13), 11: (21, 17)}
    for b in range(1, 12):
        tables[f"huff_code{b}"] = extract(
            rom, f"FDKaacEnc_huff_ctab{b}[", shapes[b], np.int64).reshape(dims[b])
    tables["huff_codescf"] = extract(rom, "FDKaacEnc_huff_ctabscf", 121, np.int64)

    # SBR envelope/noise huffman books (libSBRenc/src/cmondata.h)
    cmon = strip_comments((REF / "libSBRenc/src/sbrenc_rom.cpp").read_text())
    for name, n in [("v_Huff_envelopeLevelC10T", 121), ("v_Huff_envelopeLevelL10T", 121),
                    ("v_Huff_envelopeLevelC10F", 121), ("v_Huff_envelopeLevelL10F", 121),
                    ("v_Huff_envelopeLevelC11T", 63), ("v_Huff_envelopeLevelL11T", 63),
                    ("v_Huff_envelopeLevelC11F", 63), ("v_Huff_envelopeLevelL11F", 63),
                    ("v_Huff_NoiseLevelC11T", 63), ("v_Huff_NoiseLevelL11T", 63),
                    ("bookSbrEnvBalanceC10T", 49), ("bookSbrEnvBalanceL10T", 49),
                    ("bookSbrEnvBalanceC10F", 49), ("bookSbrEnvBalanceL10F", 49),
                    ("bookSbrEnvBalanceC11T", 25), ("bookSbrEnvBalanceL11T", 25),
                    ("bookSbrEnvBalanceC11F", 25), ("bookSbrEnvBalanceL11F", 25),
                    ("bookSbrNoiseBalanceC11T", 25), ("bookSbrNoiseBalanceL11T", 25)]:
        tables[f"sbr_{name}"] = extract(cmon, name, n, np.int64)
    # PS IID huffman tables (libSBRenc/src/ps_bitenc.cpp)
    psb = strip_comments((REF / "libSBRenc/src/ps_bitenc.cpp").read_text())
    for name, n in [("iidDeltaFreqCoarse_Length", 29), ("iidDeltaFreqCoarse_Code", 29),
                    ("iidDeltaFreqFine_Length", 61), ("iidDeltaFreqFine_Code", 61),
                    ("iidDeltaTimeCoarse_Length", 29), ("iidDeltaTimeCoarse_Code", 29),
                    ("iidDeltaTimeFine_Length", 61), ("iidDeltaTimeFine_Code", 61),
                    ("iccDeltaFreq_Length", 15), ("iccDeltaFreq_Code", 15),
                    ("iccDeltaTime_Length", 15), ("iccDeltaTime_Code", 15)]:
        tables[f"ps_{name}"] = extract(psb, name, n, np.int64)

    # start-band tables (libSBRdec/src/sbr_rom.cpp), DUAL rate rows
    dec = strip_comments((REF / "libSBRdec/src/sbr_rom.cpp").read_text())
    for rate in [16, 22, 24, 32, 40, 44, 48, 64]:
        t = extract(dec, f"FDK_sbrDecoder_sbr_start_freq_{rate}[][16]", 32, np.int64)
        tables[f"sbr_start_band_{rate}"] = t.reshape(2, 16)[0]

    # 640-tap QMF prototype filter (libFDK/src/FDK_tools_rom.cpp
    # qmf_pfilt640, Q31 fixed point -> float64); the ISO/IEC 14496-3
    # Table 4.A.87 window of the 64-band analysis/synthesis bank
    rom2 = strip_comments(
        (REF / "libFDK/src/FDK_tools_rom.cpp").read_text())
    # the scalar qmf_pfilt640[] stores only 330 values (symmetry-folded);
    # the _vector variant carries all 640 as 32 blocks x 5 rows x 4 sets:
    # vector[b*20 + r*4 + j] = p[(4b + j) + 128*r]
    i = rom2.index("qmf_pfilt640_vector[]")
    j = rom2.index("{", i)
    body = rom2[j:rom2.index(";", j)]
    vals = [int(x, 16) for x in re.findall(r"0[xX][0-9a-fA-F]+", body)]
    assert len(vals) == 640, len(vals)
    q = np.asarray(vals, np.uint32).astype(np.int64)
    q = np.where(q >= 2**31, q - 2**32, q).astype(np.float64) / 2.0**31
    p = np.zeros(640)
    for b in range(32):
        for r in range(5):
            for jj in range(4):
                p[(4 * b + jj) + 128 * r] = q[b * 20 + r * 4 + jj]
    tables["sbr_qmf_proto640"] = p

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes): {len(tables)} tables")


if __name__ == "__main__":
    main()
