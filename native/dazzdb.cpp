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
//   .<root>.idx : DAZZ_DB header block (struct below, 120 bytes
//                 including pointer slots stored as garbage), then
//                 `ureads` DAZZ_READ records of 40 bytes:
//                   int origin; int rlen; int fpulse;  (+4 pad)
//                   int64 boff; int64 coff; int flags; (+4 pad)
//   .<root>.bps : 2-bit packed bases, 4 per byte, high bits first
//                 (base = (byte >> (6 - 2*k)) & 3 -> ACGT).
//   <root>.las  : int64 novl; int tspace; (+4 pad) then per overlap a
//                 40-byte record (the in-memory Overlap struct minus
//                 its leading trace pointer):
//                   int tlen; int diffs; int abpos; int aepos;
//                   int bbpos; int bepos; uint32 flags;
//                   int aread; int bread; (+4 pad)
//                 followed by tlen trace bytes (tspace <= 125) or
//                 2*tlen bytes (uint16 traces) — skipped here; dazcon
//                 re-aligns from raw sequences.
//   COMP flag (0x1) on an overlap means the B read aligns reverse-
//   complemented.

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

static const size_t kIdxHeader = 120;  // DAZZ_DB struct dump size
static const size_t kReadRec = 40;
static const size_t kLasHeader = 16;  // int64 novl + int tspace + pad
static const size_t kOvlRec = 40;
static const uint32_t kCompFlag = 0x1;

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
  if (novl < 0) return nullptr;
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
    memcpy(&o.abpos, r + 8, 4);
    memcpy(&o.aepos, r + 12, 4);
    memcpy(&o.bbpos, r + 16, 4);
    memcpy(&o.bepos, r + 20, 4);
    memcpy(&flags, r + 24, 4);
    memcpy(&o.aread, r + 28, 4);
    memcpy(&o.bread, r + 32, 4);
    o.comp = (flags & kCompFlag) ? 1 : 0;
    if (off + kOvlRec + (size_t)tlen * tbytes > buf.size() || tlen < 0) {
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

}  // extern "C"
