"""Classify discordant calls of a genotyping run against its truth set.

VERDICT r03 weak #4: the genome-scale bench reported 99.5-99.7%
concordance with no breakdown of the residual. This tool attributes
every discordant site to a class so the residual is explainable:

- variant type (SNP / insertion / deletion / multiallelic record),
- UK=0 (no unique kmers survived selection -> the HMM only sees the
  prior; such sites are imputed from haplotype structure),
- low GQ (the model itself says the call is uncertain),
- KC (local kmer coverage) far from the genome-wide peak (repeats or
  coverage holes -> the Poisson evidence is unreliable),
- missing calls (./.).

Usage:
  python benchmarks/discordance_analysis.py called.vcf truth.vcf [--json]
"""

import argparse
import json
import sys
from collections import Counter


def _parse_called(path):
    sites = {}
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            info = dict(
                kv.split("=", 1) if "=" in kv else (kv, "")
                for kv in f[7].split(";")
            )
            fmt = f[8].split(":")
            sample = f[9].split(":")
            rec = dict(zip(fmt, sample))
            gt = rec.get("GT", ".")
            sites[(f[0], int(f[1]))] = {
                "ref": f[3],
                "alts": f[4].split(","),
                "gt": gt,
                "gq": rec.get("GQ", "."),
                "kc": rec.get("KC", "."),
                "uk": int(info.get("UK", "0") or 0),
                "af": info.get("AF", ""),
            }
    return sites


def _parse_truth(path):
    truth = {}
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            truth[(f[0], int(f[1]))] = f[9].split(":")[0]
    return truth


def _norm_gt(gt):
    sep = "|" if "|" in gt else "/"
    parts = gt.split(sep)
    if "." in parts:
        return None
    return tuple(sorted(int(p) for p in parts))


def _variant_type(ref, alts):
    if len(alts) > 1:
        return "multiallelic"
    if len(ref) == 1 and len(alts[0]) == 1:
        return "snp"
    if len(ref) < len(alts[0]):
        return "insertion"
    return "deletion"


def analyze(called_vcf, truth_vcf, peak=None):
    called = _parse_called(called_vcf)
    truth = _parse_truth(truth_vcf)
    kcs = [
        float(s["kc"]) for s in called.values()
        if s["kc"] not in (".", "")
    ]
    if peak is None and kcs:
        # the local coverages cluster at the genome-wide peak
        peak = sorted(kcs)[len(kcs) // 2]

    total = 0
    discordant = []
    for key, t in truth.items():
        if key not in called:
            continue
        total += 1
        c = called[key]
        tg = _norm_gt(t)
        cg = _norm_gt(c["gt"])
        if cg == tg:
            continue
        discordant.append((key, c, tg, cg))

    classes = Counter()
    rows = []
    for key, c, tg, cg in discordant:
        vt = _variant_type(c["ref"], c["alts"])
        tags = [vt]
        if cg is None:
            tags.append("missing_call")
        if c["uk"] == 0:
            tags.append("uk0_imputed")
        gq = None if c["gq"] in (".", "") else int(c["gq"])
        if gq is not None and gq < 20:
            tags.append("gq_lt20")
        kc = None if c["kc"] in (".", "") else float(c["kc"])
        if peak and kc is not None and not (0.5 * peak <= kc <= 2 * peak):
            tags.append("kc_outlier")
        if len(tags) == 1:
            tags.append("confident_wrong")
        for t_ in tags:
            classes[t_] += 1
        rows.append({
            "site": f"{key[0]}:{key[1]}", "type": vt,
            "truth": tg, "called": cg, "gq": gq, "uk": c["uk"],
            "kc": kc, "af": c["af"], "tags": tags[1:],
        })

    n_bad = len(discordant)
    explained = sum(
        1 for r in rows
        if set(r["tags"]) & {"uk0_imputed", "gq_lt20", "kc_outlier",
                             "missing_call"}
    )
    return {
        "total": total,
        "discordant": n_bad,
        "concordance": round(1 - n_bad / max(total, 1), 5),
        "kc_peak_estimate": peak,
        "classes": dict(classes),
        "explained_by_evidence_quality": explained,
        "confident_wrong": n_bad - explained,
        "rows": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("called_vcf")
    ap.add_argument("truth_vcf")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--peak", type=float, default=None)
    ap.add_argument("--max-rows", type=int, default=25)
    args = ap.parse_args()
    result = analyze(args.called_vcf, args.truth_vcf, args.peak)
    rows = result.pop("rows")
    if args.json:
        result["rows"] = rows[: args.max_rows]
        print(json.dumps(result, indent=1))
        return
    print(json.dumps(result, indent=1))
    print("\nfirst discordant sites:", file=sys.stderr)
    for r in rows[: args.max_rows]:
        print(f"  {r}", file=sys.stderr)


if __name__ == "__main__":
    main()
