// Cross-implementation golden generator, run once against the reference
// crate (xorfilter-rs 0.6.0).  Two directions:
//
//  (a) WRITE: build Xor8<BuildHasherDefault> filters over fixed key sets
//      (10k strings "key-%05d"; 10k u64 0..10000), serialize with
//      to_bytes() (V2 ^TL2), and record seed/block_length plus the exact
//      false-positive indices among 10k held-out probes.
//  (b) READ: parse the Python-written V2 files with Xor8::from_bytes and
//      assert every member key probes true; record the miss-hit indices.
//
// Output artifacts land in tests/golden/ of the Python repo.
use std::fs;
use std::io::Write;

use xorfilter::xor8::{Xor8, Xor8Builder};
use xorfilter::BuildHasherDefault;

const N: usize = 10_000;
const OUT: &str = "/root/repo/tests/golden";

type Hb = BuildHasherDefault;

fn json_indices(v: &[usize]) -> String {
    let items: Vec<String> = v.iter().map(|i| i.to_string()).collect();
    format!("[{}]", items.join(","))
}

fn report_filter(
    f: &Xor8<Hb>,
    member_strs: Option<&[String]>,
    miss_strs: Option<&[String]>,
    member_u64: Option<&[u64]>,
    miss_u64: Option<&[u64]>,
) -> (bool, Vec<usize>) {
    let mut all = true;
    let mut hits = Vec::new();
    if let (Some(ms), Some(xs)) = (member_strs, miss_strs) {
        for k in ms {
            if !f.contains(k.as_str()) {
                all = false;
            }
        }
        for (i, k) in xs.iter().enumerate() {
            if f.contains(k.as_str()) {
                hits.push(i);
            }
        }
    }
    if let (Some(ms), Some(xs)) = (member_u64, miss_u64) {
        for k in ms {
            if !f.contains(k) {
                all = false;
            }
        }
        for (i, k) in xs.iter().enumerate() {
            if f.contains(k) {
                hits.push(i);
            }
        }
    }
    (all, hits)
}

fn main() {
    let keys: Vec<String> = (0..N).map(|i| format!("key-{:05}", i)).collect();
    let misses: Vec<String> = (0..N).map(|i| format!("miss-{:05}", i)).collect();
    let keys_u: Vec<u64> = (0..N as u64).collect();
    let misses_u: Vec<u64> = (N as u64..2 * N as u64).collect();

    // ---- (a) Rust-built filters ----
    let mut b = Xor8Builder::<Hb>::new();
    b.populate(&keys);
    let f_str: Xor8<Hb> = b.build().expect("build str");
    let bytes = f_str.to_bytes();
    fs::write(format!("{}/rust-xor8-v2-str.tl2", OUT), &bytes).unwrap();
    let (all_s, hits_s) = report_filter(&f_str, Some(&keys), Some(&misses), None, None);

    let mut bu = Xor8Builder::<Hb>::new();
    bu.populate(&keys_u);
    let f_u: Xor8<Hb> = bu.build().expect("build u64");
    fs::write(format!("{}/rust-xor8-v2-u64.tl2", OUT), f_u.to_bytes()).unwrap();
    let (all_u, hits_u) = report_filter(&f_u, None, None, Some(&keys_u), Some(&misses_u));

    let mut g = fs::File::create(format!("{}/rust-golden.json", OUT)).unwrap();
    write!(
        g,
        "{{\n \"rust_str\": {{\"file\": \"rust-xor8-v2-str.tl2\", \"n_keys\": {}, \"seed\": {}, \"block_length\": {}, \"members_all_true\": {}, \"miss_hit_indices\": {}}},\n \"rust_u64\": {{\"file\": \"rust-xor8-v2-u64.tl2\", \"n_keys\": {}, \"seed\": {}, \"block_length\": {}, \"members_all_true\": {}, \"miss_hit_indices\": {}}}\n}}\n",
        N, f_str.seed, f_str.block_length, all_s, json_indices(&hits_s),
        N, f_u.seed, f_u.block_length, all_u, json_indices(&hits_u),
    )
    .unwrap();

    // ---- (b) Rust parses the Python-written files ----
    let buf = fs::read(format!("{}/py-xor8-v2-str.tl2", OUT)).unwrap();
    let pf: Xor8<Hb> = Xor8::from_bytes(buf).expect("parse py str file");
    let (pall_s, phits_s) = report_filter(&pf, Some(&keys), Some(&misses), None, None);

    let buf_u = fs::read(format!("{}/py-xor8-v2-u64.tl2", OUT)).unwrap();
    let pfu: Xor8<Hb> = Xor8::from_bytes(buf_u).expect("parse py u64 file");
    let (pall_u, phits_u) = report_filter(&pfu, None, None, Some(&keys_u), Some(&misses_u));

    let mut r = fs::File::create(format!("{}/rust-parse-report.json", OUT)).unwrap();
    write!(
        r,
        "{{\n \"py_str_parsed\": {{\"seed\": {}, \"block_length\": {}, \"members_all_true\": {}, \"miss_hit_indices\": {}}},\n \"py_u64_parsed\": {{\"seed\": {}, \"block_length\": {}, \"members_all_true\": {}, \"miss_hit_indices\": {}}}\n}}\n",
        pf.seed, pf.block_length, pall_s, json_indices(&phits_s),
        pfu.seed, pfu.block_length, pall_u, json_indices(&phits_u),
    )
    .unwrap();

    println!(
        "rust str: seed={} bl={} all={} fp={}  | rust u64: seed={} bl={} all={} fp={}",
        f_str.seed, f_str.block_length, all_s, hits_s.len(),
        f_u.seed, f_u.block_length, all_u, hits_u.len()
    );
    println!(
        "py->rust str: all={} fp={}  | py->rust u64: all={} fp={}",
        pall_s, phits_s.len(), pall_u, phits_u.len()
    );
}
