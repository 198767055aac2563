// Native BoxQP instance IO: fast .in parser (data-loader path).
//
// The suite runner reads 100+ instances per experiment; this replaces the
// Python tokenizing parser on the hot IO path (instances/boxqp.py falls back
// to Python when the library is absent).  Format: n, then c (n values), then
// Q rows (n*n values), whitespace-separated.

#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Parse path into c (cap >= nmax) and Q (cap >= nmax*nmax).
// Returns n on success, -1 on open failure, -2 on truncated/oversized file.
int boxqp_parse(const char* path, double* c, double* Q, int nmax) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char* buf = (char*)std::malloc(sz + 1);
  if (!buf || std::fread(buf, 1, sz, f) != (size_t)sz) {
    std::fclose(f);
    std::free(buf);
    return -2;
  }
  std::fclose(f);
  buf[sz] = 0;

  char* p = buf;
  char* end;
  long n = std::strtol(p, &end, 10);
  if (end == p || n <= 0 || n > nmax) {
    std::free(buf);
    return -2;
  }
  p = end;
  for (long i = 0; i < n; ++i) {
    c[i] = std::strtod(p, &end);
    if (end == p) { std::free(buf); return -2; }
    p = end;
  }
  for (long i = 0; i < n * n; ++i) {
    Q[i] = std::strtod(p, &end);
    if (end == p) { std::free(buf); return -2; }
    p = end;
  }
  std::free(buf);
  return (int)n;
}

}  // extern "C"
