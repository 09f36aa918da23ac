// DAZZ_DB / DALIGNER container readers for the dazcon frontend.
//
// Native-format ingestion replacing the reference's bundled Gene Myers C
// (src/cpp/DB.{h,c} Open_DB/Load_Read and align.{h,c} .las overlap
// iteration, SURVEY.md §2 C9 — reconstructed; the reference mount is
// empty, so the byte layouts below are derived from training knowledge
// of upstream DAZZ_DB/DALIGNER and pinned by round-trip tests against
// the fixture writer in tests/test_dazzdb.py. Re-verify against real
// DAZZ_DB files when available.
//
// Layout assumptions (64-bit little-endian, natural struct alignment):
//   .<root>.idx : one HITS_DB struct dump (112 bytes on LP64:
//                 ureads/treads/cutoff/allarr + float freq[4] + maxlen
//                 + 4 pad + int64 totlen + nreads/trimmed/part/ufirst/
//                 tfirst + 4 pad + 5 pointer slots stored as garbage),
//                 then `ureads` HITS_READ records of 40 bytes:
//                   int origin; int rlen; int fpulse;  (+4 pad)
//                   int64 boff; int64 coff; int flags; (+4 pad)
//   .<root>.bps : 2-bit packed bases, 4 per byte, high bits first
//                 (base = (byte >> (6 - 2*k)) & 3 -> ACGT).
//   <root>.las  : int64 novl; int tspace; (12 bytes — align.c writes
//                 the two fields with separate fwrites, so there is NO
//                 struct padding) then per overlap a 40-byte record
//                 (sizeof(Overlap) - ptr: the in-memory Overlap minus
//                 its leading trace pointer; Path stores the begin
//                 pair then the end pair):
//                   int tlen; int diffs; int abpos; int bbpos;
//                   int aepos; int bepos; uint32 flags;
//                   int aread; int bread; (+4 pad)
//                 followed by tlen trace bytes (tspace <= 125) or
//                 2*tlen bytes (uint16 traces) — skipped here; dazcon
//                 re-aligns from raw sequences.
//   COMP flag (0x1) on an overlap means the B read aligns reverse-
//   complemented.
//   .<root>.qvs : compressed QV streams (the QV.{h,c} capability of
//                 SURVEY.md §2 C9: five per-read tracks — delQV,
//                 delTag, insQV, mergeQV, subQV — Huffman-coded).
//                 Documented layout (round-trip pinned by
//                 tests/test_dazzdb.py; re-verify against real files
//                 when a reference mount exists):
//                   int32 ntracks (= 5); per track a canonical-Huffman
//                   table: int32 ncodes, then ncodes x (uint8 symbol,
//                   uint8 codelen); then per read, per track, the
//                   MSB-first bit-packed codes for rlen symbols, each
//                   track byte-aligned. A read's block offset in .qvs
//                   is the `coff` field of its .idx record.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace dazz {

struct Read {
  int rlen;
  int64_t boff;
};

struct Db {
  std::vector<Read> reads;
  std::vector<uint8_t> bps;  // whole .bps loaded
};

struct Ovl {
  int32_t aread, bread, comp, abpos, aepos, bbpos, bepos, diffs;
  int32_t toff, tpairs;  // into Las::trace (already widened to u16)
};

struct Las {
  std::vector<Ovl> ovls;
  std::vector<uint16_t> trace;  // (d, y) pairs, flattened
  int32_t tspace;
};

static bool read_file(const std::string& path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n < 0) {  // ftell failure (e.g. a directory): clean error
    fclose(f);
    return false;
  }
  out.resize((size_t)n);
  size_t rd = n ? fread(out.data(), 1, (size_t)n, f) : 0;
  fclose(f);
  return (long)rd == n;
}

// Hidden-file path: "<dir>/.<root>.<ext>" for "<dir>/<root>.db".
static std::string hidden(const std::string& dbpath, const char* ext) {
  std::string dir, root = dbpath;
  size_t slash = dbpath.rfind('/');
  if (slash != std::string::npos) {
    dir = dbpath.substr(0, slash + 1);
    root = dbpath.substr(slash + 1);
  }
  size_t dot = root.rfind(".db");
  if (dot != std::string::npos && dot == root.size() - 3)
    root = root.substr(0, dot);
  return dir + "." + root + "." + ext;
}

static const size_t kIdxHeader = 112;  // sizeof(HITS_DB) on LP64
static const size_t kReadRec = 40;
static const size_t kLasHeader = 12;  // int64 novl + int tspace
// (two separate fwrites in align.c — NO struct padding on disk)
static const size_t kOvlRec = 40;
static const uint32_t kCompFlag = 0x1;
static const int kQvTracks = 5;

// Canonical-Huffman decode table for one QV track: symbols sorted by
// (codelen, symbol); first_code[l] = smallest code of length l;
// first_idx[l] = rank of that code's symbol in the sorted order.
struct QvTable {
  std::vector<uint8_t> symbols;     // sorted by (len, symbol)
  uint32_t first_code[33];
  int32_t first_idx[33];
  uint8_t max_len = 0;
  bool build(const std::vector<std::pair<uint8_t, uint8_t>>& codes) {
    int count[33] = {0};
    for (auto& c : codes) {
      if (c.second < 1 || c.second > 32) return false;
      count[c.second]++;
      if (c.second > max_len) max_len = c.second;
    }
    symbols.reserve(codes.size());
    // codes arrive sorted by (len, symbol) from the writer; re-sort
    // defensively (stable layout contract, cheap at table size).
    std::vector<std::pair<uint8_t, uint8_t>> s(codes);
    for (size_t i = 1; i < s.size(); ++i) {  // insertion sort
      auto key = s[i];
      size_t j = i;
      while (j > 0 && (s[j - 1].second > key.second ||
                       (s[j - 1].second == key.second &&
                        s[j - 1].first > key.first))) {
        s[j] = s[j - 1];
        --j;
      }
      s[j] = key;
    }
    uint32_t code = 0;
    int idx = 0;
    for (int l = 1; l <= 32; ++l) {
      code <<= 1;
      first_code[l] = code;
      first_idx[l] = idx;
      code += (uint32_t)count[l];
      idx += count[l];
    }
    for (auto& c : s) symbols.push_back(c.first);
    return true;
  }
};

struct Qv {
  QvTable tables[kQvTracks];
  std::vector<uint8_t> data;      // raw .qvs payload
  size_t payload_off = 0;         // first byte after the tables
  std::vector<int> rlens;         // from .idx
  std::vector<int64_t> coffs;     // from .idx
};

}  // namespace dazz

extern "C" {

// Open <root>.db (+ hidden .idx/.bps): returns handle or NULL.
void* dazz_open(const char* dbpath) {
  using namespace dazz;
  std::vector<uint8_t> idx;
  if (!read_file(hidden(dbpath, "idx"), idx)) return nullptr;
  if (idx.size() < kIdxHeader) return nullptr;
  int32_t ureads;
  memcpy(&ureads, idx.data(), 4);
  if (ureads < 0 ||
      idx.size() < kIdxHeader + (size_t)ureads * kReadRec)
    return nullptr;
  Db* db = new Db();
  db->reads.resize(ureads);
  for (int i = 0; i < ureads; ++i) {
    const uint8_t* r = idx.data() + kIdxHeader + (size_t)i * kReadRec;
    memcpy(&db->reads[i].rlen, r + 4, 4);
    memcpy(&db->reads[i].boff, r + 16, 8);
  }
  if (!read_file(hidden(dbpath, "bps"), db->bps)) {
    delete db;
    return nullptr;
  }
  // Validate every record against the actual .bps size up front: a
  // truncated or foreign-layout file fails the open cleanly instead of
  // reading garbage later (ref DB.c::Open_DB error paths, SURVEY §2 C9).
  for (int i = 0; i < ureads; ++i) {
    const Read& rd = db->reads[i];
    if (rd.rlen < 0 || rd.boff < 0 ||
        (size_t)rd.boff + ((size_t)rd.rlen + 3) / 4 > db->bps.size()) {
      delete db;
      return nullptr;
    }
  }
  return db;
}

void dazz_close(void* h) { delete (dazz::Db*)h; }

int dazz_nreads(void* h) { return (int)((dazz::Db*)h)->reads.size(); }

int dazz_read_len(void* h, int i) {
  dazz::Db* db = (dazz::Db*)h;
  if (i < 0 || i >= (int)db->reads.size()) return -1;
  return db->reads[i].rlen;
}

// Decode read i into buf (caller sizes via dazz_read_len); ACGT chars.
int dazz_read_seq(void* h, int i, char* buf) {
  dazz::Db* db = (dazz::Db*)h;
  if (i < 0 || i >= (int)db->reads.size()) return -1;
  static const char kBases[4] = {'A', 'C', 'G', 'T'};
  int64_t off = db->reads[i].boff;
  int len = db->reads[i].rlen;
  if (off < 0 || (size_t)(off + (len + 3) / 4) > db->bps.size())
    return -1;
  for (int k = 0; k < len; ++k) {
    uint8_t byte = db->bps[(size_t)off + k / 4];
    buf[k] = kBases[(byte >> (6 - 2 * (k % 4))) & 3];
  }
  return len;
}

// Open a .las overlap file; returns handle or NULL.
void* las_open(const char* path) {
  using namespace dazz;
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return nullptr;
  if (buf.size() < kLasHeader) return nullptr;
  int64_t novl;
  int32_t tspace;
  memcpy(&novl, buf.data(), 8);
  memcpy(&tspace, buf.data() + 8, 4);
  if (novl < 0 || tspace < 0) return nullptr;
  // Cheap plausibility bound: even empty-trace records are kOvlRec
  // bytes, so novl beyond the file size means a foreign/corrupt header.
  if ((uint64_t)novl > (buf.size() - kLasHeader) / kOvlRec)
    return nullptr;
  size_t tbytes = tspace <= 125 ? 1 : 2;
  Las* las = new Las();
  las->tspace = tspace;
  las->ovls.reserve((size_t)novl);
  size_t off = kLasHeader;
  for (int64_t i = 0; i < novl; ++i) {
    if (off + kOvlRec > buf.size()) {
      delete las;
      return nullptr;
    }
    const uint8_t* r = buf.data() + off;
    Ovl o;
    int32_t tlen;
    uint32_t flags;
    memcpy(&tlen, r + 0, 4);
    memcpy(&o.diffs, r + 4, 4);
    // Path field order on disk: abpos, bbpos (begin pair), then
    // aepos, bepos (end pair) — align.h's Path struct.
    memcpy(&o.abpos, r + 8, 4);
    memcpy(&o.bbpos, r + 12, 4);
    memcpy(&o.aepos, r + 16, 4);
    memcpy(&o.bepos, r + 20, 4);
    memcpy(&flags, r + 24, 4);
    memcpy(&o.aread, r + 28, 4);
    memcpy(&o.bread, r + 32, 4);
    o.comp = (flags & kCompFlag) ? 1 : 0;
    if (tlen < 0 ||
        off + kOvlRec + (size_t)tlen * tbytes > buf.size()) {
      delete las;
      return nullptr;
    }
    // Decode trace values (tlen values = tlen/2 (d, y) pairs; u8 for
    // tspace <= 125, else u16 little-endian) — the align.c trace
    // decoding capability (SURVEY.md §2 C9).
    const uint8_t* tp = r + kOvlRec;
    o.toff = (int32_t)las->trace.size();
    o.tpairs = tlen / 2;
    for (int32_t k = 0; k < tlen; ++k) {
      uint16_t v;
      if (tbytes == 1) {
        v = tp[k];
      } else {
        memcpy(&v, tp + 2 * k, 2);
      }
      las->trace.push_back(v);
    }
    off += kOvlRec + (size_t)tlen * tbytes;
    las->ovls.push_back(o);
  }
  return las;
}

// tspace of an open .las (trace-point spacing on the A read).
int las_tspace(void* h) { return (int)((dazz::Las*)h)->tspace; }

// Number of (diffs, b-advance) trace pairs for overlap i (-1 if oob).
int las_trace_len(void* h, long i) {
  dazz::Las* las = (dazz::Las*)h;
  if (i < 0 || i >= (long)las->ovls.size()) return -1;
  return las->ovls[(size_t)i].tpairs;
}

// Fill out[2 * tpairs] with the decoded (d, y) trace values of
// overlap i; returns pair count or -1.
int las_trace(void* h, long i, int32_t* out) {
  dazz::Las* las = (dazz::Las*)h;
  if (i < 0 || i >= (long)las->ovls.size()) return -1;
  const dazz::Ovl& o = las->ovls[(size_t)i];
  for (int32_t k = 0; k < 2 * o.tpairs; ++k)
    out[k] = las->trace[(size_t)o.toff + k];
  return o.tpairs;
}

void las_close(void* h) { delete (dazz::Las*)h; }

long las_novl(void* h) { return (long)((dazz::Las*)h)->ovls.size(); }

// Fill caller arrays (each sized novl) with the overlap fields.
int las_overlaps(void* h, int32_t* aread, int32_t* bread, int32_t* comp,
                 int32_t* abpos, int32_t* aepos, int32_t* bbpos,
                 int32_t* bepos, int32_t* diffs) {
  dazz::Las* las = (dazz::Las*)h;
  for (size_t i = 0; i < las->ovls.size(); ++i) {
    const dazz::Ovl& o = las->ovls[i];
    aread[i] = o.aread;
    bread[i] = o.bread;
    comp[i] = o.comp;
    abpos[i] = o.abpos;
    aepos[i] = o.aepos;
    bbpos[i] = o.bbpos;
    bepos[i] = o.bepos;
    diffs[i] = o.diffs;
  }
  return 0;
}

// Open the .qvs QV streams of <root>.db; returns handle or NULL.
void* dazz_qv_open(const char* dbpath) {
  using namespace dazz;
  std::vector<uint8_t> idx;
  if (!read_file(hidden(dbpath, "idx"), idx)) return nullptr;
  if (idx.size() < kIdxHeader) return nullptr;
  int32_t ureads;
  memcpy(&ureads, idx.data(), 4);
  if (ureads < 0 ||
      idx.size() < kIdxHeader + (size_t)ureads * kReadRec)
    return nullptr;
  Qv* qv = new Qv();
  qv->rlens.resize(ureads);
  qv->coffs.resize(ureads);
  for (int i = 0; i < ureads; ++i) {
    const uint8_t* r = idx.data() + kIdxHeader + (size_t)i * kReadRec;
    memcpy(&qv->rlens[i], r + 4, 4);
    memcpy(&qv->coffs[i], r + 24, 8);
    if (qv->rlens[i] < 0 || qv->coffs[i] < 0) {
      delete qv;
      return nullptr;
    }
  }
  if (!read_file(hidden(dbpath, "qvs"), qv->data) ||
      qv->data.size() < 4) {
    delete qv;
    return nullptr;
  }
  int32_t ntracks;
  memcpy(&ntracks, qv->data.data(), 4);
  if (ntracks != kQvTracks) {
    delete qv;
    return nullptr;
  }
  size_t off = 4;
  for (int t = 0; t < kQvTracks; ++t) {
    if (off + 4 > qv->data.size()) {
      delete qv;
      return nullptr;
    }
    int32_t ncodes;
    memcpy(&ncodes, qv->data.data() + off, 4);
    off += 4;
    if (ncodes < 0 || off + 2 * (size_t)ncodes > qv->data.size()) {
      delete qv;
      return nullptr;
    }
    std::vector<std::pair<uint8_t, uint8_t>> codes((size_t)ncodes);
    for (int k = 0; k < ncodes; ++k) {
      codes[k] = {qv->data[off + 2 * k], qv->data[off + 2 * k + 1]};
    }
    off += 2 * (size_t)ncodes;
    if (ncodes > 0 && !qv->tables[t].build(codes)) {
      delete qv;
      return nullptr;
    }
  }
  qv->payload_off = off;
  return qv;
}

void dazz_qv_close(void* h) { delete (dazz::Qv*)h; }

int dazz_qv_ntracks(void* h) { return h ? dazz::kQvTracks : -1; }

// Decode track `t` (0 delQV, 1 delTag, 2 insQV, 3 mergeQV, 4 subQV) of
// read `i` into buf[rlen]; returns rlen or -1 (bad index / truncated /
// invalid stream).
int dazz_qv_load(void* h, int i, int t, uint8_t* buf) {
  using namespace dazz;
  Qv* qv = (Qv*)h;
  if (!qv || i < 0 || i >= (int)qv->rlens.size() || t < 0 ||
      t >= kQvTracks)
    return -1;
  int rlen = qv->rlens[i];
  const QvTable& tab = qv->tables[t];
  if (rlen > 0 && tab.symbols.empty()) return -1;
  // Walk the read's block: tracks 0..t-1 first, each byte-aligned.
  size_t off = qv->payload_off + (size_t)qv->coffs[i];
  for (int tt = 0; tt <= t; ++tt) {
    const QvTable& dt = qv->tables[tt];
    size_t bit = 0;
    uint32_t code = 0;
    int len = 0;
    for (int k = 0; k < rlen; ++k) {
      // Canonical decode: extend the code one bit at a time until it
      // falls inside a populated length class.
      for (;;) {
        size_t byte = off + bit / 8;
        if (byte >= qv->data.size()) return -1;
        code = (code << 1) |
               ((qv->data[byte] >> (7 - bit % 8)) & 1u);
        ++bit;
        ++len;
        if (len > dt.max_len) return -1;
        uint32_t fc = dt.first_code[len];
        int32_t fi = dt.first_idx[len];
        int32_t next_fi =
            len < 32 ? dt.first_idx[len + 1] : (int32_t)dt.symbols.size();
        if ((int32_t)(code - fc) < next_fi - fi && code >= fc) {
          if (tt == t) buf[k] = dt.symbols[fi + (code - fc)];
          code = 0;
          len = 0;
          break;
        }
      }
    }
    off += (bit + 7) / 8;  // byte-align the next track
  }
  return rlen;
}

}  // extern "C"
