#!/usr/bin/env python3
"""One-off metadata miner: reads the reference's scrapeXML() R source and
emits core238.csv — per CORE variable: xpath variants (coalesce order),
rule (zeroALL/zeroPC/zeroEZ), checkbox recode label, multi-value sep,
collapse parts. The CSV is DATA (like the master concordance); the Spark
build in graft.engine.Core238 interprets it.

Usage: python3 tools/extract_core238.py /root/reference/BUILD_SCRIPTS/build_efile_database_functions.R \
         src/main/resources/core238.csv
"""
import re, sys, csv

src, out = sys.argv[1], sys.argv[2]
lines = open(src).read().splitlines()

# region: scrapeXML function body up to the namedList
start = next(i for i, l in enumerate(lines) if l.startswith("scrapeXML <- function"))
core_start = next(i for i, l in enumerate(lines) if "core <- namedList" in l)
body = lines[start:core_start]

# canonical column order from the namedList block
named = []
for l in lines[core_start:core_start + 120]:
    named.append(re.sub(r"#.*", "", l))
    if l.strip() == ")":
        break
named_txt = " ".join(named)
m = re.search(r"namedList\s*\((.*)\)", named_txt, re.S)
order = [v.strip() for v in m.group(1).split(",") if v.strip()]

assigns = {}   # R var -> xpath literal
pastes = {}    # R var -> (list of xpaths, sep)
vars_ = {}     # VAR -> dict
seq = []

re_assign = re.compile(r'^\s*([\w.]+)\s*<-\s*"((?://|/)[^"]+)"')
re_paste = re.compile(r'^\s*([\w.]+)\s*<-\s*paste\(\s*([\w.,\s]+?)\s*,\s*sep="([^"]*)"\s*\)')
re_xmltext = re.compile(r'^\s*([A-Z][A-Z0-9]*)\s*<-\s*xml_text\(\s*xml_find_all\(\s*doc,\s*([\w.\'"/@:]+)\s*\)\s*\)')
re_rule = re.compile(r'^\s*([A-Z][A-Z0-9]*)\s*<-\s*(zeroALL|zeroPC|zeroEZ)\(\s*\1\s*\)')
re_label = re.compile(r'^\s*if\(\s*is\.na\(\s*([A-Z][A-Z0-9]*)\s*\)\s*==\s*FALSE\s*\)\s*\{\s*\1\s*<-\s*"([^"]*)"\s*\}')
re_multi = re.compile(r'^\s*([A-Z][A-Z0-9]*)\s*<-\s*paste\(\s*\1\s*,\s*collapse="([^"]*)"\s*\)')
re_collapse = re.compile(r'^\s*([A-Z][A-Z0-9]*)\s*<-\s*gsub\(\s*"NA",\s*"",\s*paste\(\s*([\w,\s]+?)\s*,\s*sep="([^"]*)"\s*\)\s*\)')
re_natoken = re.compile(r'^\s*([A-Z][A-Z0-9]*)\[\s*\1\s*==\s*"([^"]*)"\s*\]\s*<-\s*NA')
re_sched = re.compile(r'^\s*(SCHED[A-R])\s*<-\s*(?:sum\(\s*)?grepl\(\s*"(\w+)"')

def resolve(tok):
    tok = tok.strip()
    if tok in pastes:
        return pastes[tok][0]
    if tok in assigns:
        return [assigns[tok]]
    if tok.startswith('"') or tok.startswith("'"):
        return [tok.strip("\"'")]
    return None

for l in body:
    m = re_assign.match(l)
    if m:
        assigns[m.group(1)] = m.group(2)
        continue
    m = re_multi.match(l)  # must test before generic paste
    if m and m.group(1) in vars_:
        vars_[m.group(1)]["multisep"] = m.group(2)
        continue
    m = re_collapse.match(l)
    if m:
        v, parts, sep = m.group(1), [p.strip() for p in m.group(2).split(",")], m.group(3)
        vars_[v] = {"kind": "collapse", "parts": parts, "sep": sep}
        seq.append(v)
        continue
    m = re_paste.match(l)
    if m:
        toks = [t.strip() for t in m.group(2).split(",")]
        xs = []
        ok = True
        for t in toks:
            r = resolve(t)
            if r is None:
                ok = False
                break
            xs.extend(r)
        if ok and m.group(3) == "|":
            pastes[m.group(1)] = (xs, m.group(3))
        continue
    m = re_xmltext.match(l)
    if m:
        v, arg = m.group(1), m.group(2)
        xs = resolve(arg)
        if xs is None:
            xs = ["UNRESOLVED:" + arg]
        vars_[v] = {"kind": "scalar", "xpaths": xs}
        seq.append(v)
        continue
    m = re_rule.match(l)
    if m and m.group(1) in vars_:
        vars_[m.group(1)]["rule"] = m.group(2)
        continue
    m = re_label.match(l)
    if m and m.group(1) in vars_:
        vars_[m.group(1)]["label"] = m.group(2)
        continue
    m = re_natoken.match(l)
    if m and m.group(1) in vars_:
        vars_[m.group(1)]["natoken"] = m.group(2)
        continue
    m = re_sched.match(l)
    if m:
        vars_[m.group(1)] = {"kind": "sched", "token": m.group(2)}
        seq.append(m.group(1))
        continue

# Hand-coded conditional source-or-sum variables: the R assigns them inside
# if(FORMTYPE==...) blocks (R:1032-1081, 1290-1305, 1515-1545), which the
# line-scanner records as the EZ branch only. KIND=condsum means:
# EZ doc -> coalesce(xpaths); 990 doc -> NA-skip sum of PARTS (which are
# themselves zeroPC'd); then RULE.
vars_["EXPGAMINGFNDEVENTS"] = {
    "kind": "condsum",
    "xpaths": ["//Return/ReturnData/IRS990EZ/SpecialEventsDirectExpensesAmt",
               "//Return/ReturnData/IRS990EZ/SpecialEventsDirectExpenses"],
    "parts": ["GAMINGEXP", "FNDEVENTSEXP"], "rule": "zeroALL"}
vars_["NETGAMINGFNDEVENTS"] = {
    "kind": "condsum",
    "xpaths": ["//Return/ReturnData/IRS990EZ/SpecialEventsNetIncomeLossAmt",
               "//Return/ReturnData/IRS990EZ/SpecialEventsNetIncomeLoss"],
    "parts": ["GAMINGNET", "FNDEVENTSNET"], "rule": "zeroALL"}
vars_["PROFEESINDEP"] = {
    "kind": "condsum",
    "xpaths": ["//Return/ReturnData/IRS990EZ/FeesAndOtherPymtToIndCntrctAmt",
               "//Return/ReturnData/IRS990EZ/FeesAndOthPymtToIndContractors"],
    "parts": ["FEESMGMT", "FEESLEGAL", "FEESACCT", "FEESLOBBY",
              "FEESPROFND", "FEESINVMGMT", "FEESOTHER"], "rule": "zeroALL"}
vars_["CASHINVBEGYEAR"] = {
    "kind": "condsum",
    "xpaths": ["//Return/ReturnData/IRS990EZ/CashSavingsAndInvestmentsGrp/BOYAmt",
               "//Return/ReturnData/IRS990EZ/CashSavingsAndInvestments/BOY"],
    "parts": ["CASHBEGYEAR", "SAVINVBEGYEAR"], "rule": "zeroALL"}
vars_["CASHINVENDYEAR"] = {
    "kind": "condsum",
    "xpaths": ["//Return/ReturnData/IRS990EZ/CashSavingsAndInvestmentsGrp/EOYAmt",
               "//Return/ReturnData/IRS990EZ/CashSavingsAndInvestments/EOY"],
    "parts": ["CASHENDYEAR", "SAVINVENDYEAR"], "rule": "zeroALL"}
# URL is the source url column, not an xpath
vars_["URL"] = {"kind": "url"}
# DOMICILE / FILINGSTATES carry a collapse sep -> multi-value extract
for v in ("DOMICILE", "FILINGSTATES"):
    if v in vars_ and vars_[v].get("multisep"):
        vars_[v]["kind"] = "multi"

with open(out, "w", newline="") as f:
    w = csv.writer(f, delimiter=";")
    w.writerow(["VAR", "KIND", "XPATHS", "RULE", "LABEL", "SEP", "PARTS", "NATOKEN"])
    missing = []
    seen = set()
    for v in order:
        if v in seen:
            continue  # reference lists ORGDISSOLVED twice; emit once
        seen.add(v)
        d = vars_.get(v)
        if d is None:
            missing.append(v)
            w.writerow([v, "special", "", "", "", "", "", ""])
            continue
        # a checkbox recode to the EMPTY string (FORMORGOTHER) must be
        # distinguishable from "no recode" in the CSV
        label = d.get("label")
        label = "__EMPTY__" if label == "" else (label or "")
        w.writerow([
            v, d.get("kind", "scalar"), "|".join(d.get("xpaths", [])),
            d.get("rule", ""), label,
            d.get("multisep", d.get("sep", "")),
            ",".join(d.get("parts", [])), d.get("natoken", ""),
        ])
print(f"{len(seen)} columns; special/hand-coded: {missing}")
unres = [v for v, d in vars_.items() if any("UNRESOLVED" in x for x in d.get("xpaths", []))]
print("unresolved xpaths:", unres)
