// Native IO runtime for tpulbm.
//
// Provides the formatted-text hot paths that the reference implements in C
// stdio (write_values, d2q9-bgk.c:1034-1143) and the obstacle-list parser
// (d2q9-bgk.c:912-957). Exposed with a C ABI for ctypes.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cerrno>

#include <memory>

namespace {
// Large per-stream stdio buffer (heap-allocated so concurrent calls from
// multiple Python threads — ctypes releases the GIL — don't share state).
struct BufferedFile {
  FILE* fp = nullptr;
  std::unique_ptr<char[]> buf;
  explicit BufferedFile(const char* path, size_t bufsize) {
    fp = fopen(path, "w");
    if (fp) {
      buf.reset(new char[bufsize]);
      setvbuf(fp, buf.get(), _IOFBF, bufsize);
    }
  }
  // Returns nonzero on failure; buffer must outlive the stream, so close
  // before the destructor frees it.
  int close() {
    int rc = fp ? fclose(fp) : 1;
    fp = nullptr;
    return rc;
  }
  ~BufferedFile() {
    if (fp) fclose(fp);
  }
};
}  // namespace

extern "C" {

// Writes final_state.dat: "%d %d %.12E %.12E %.12E %.12E %d\n" per cell,
// y-major ascending (matches d2q9-bgk.c:1115 and the rank-ordered append of
// :1049-1122, which is global-row ordered by construction).
int tpulbm_write_final_state(const char* path, int nx, int ny,
                             const float* u_x, const float* u_y,
                             const float* u, const float* pressure,
                             const int* obstacles) {
  // 4 MB buffered stdio keeps syscall count low for million-line outputs.
  BufferedFile out(path, 1 << 22);
  if (!out.fp) return 1;
  for (int yy = 0; yy < ny; ++yy) {
    const long row = (long)yy * nx;
    for (int xx = 0; xx < nx; ++xx) {
      const long i = row + xx;
      if (fprintf(out.fp, "%d %d %.12E %.12E %.12E %.12E %d\n", xx, yy,
                  (double)u_x[i], (double)u_y[i], (double)u[i],
                  (double)pressure[i], obstacles[i]) < 0) {
        return 1;
      }
    }
  }
  return out.close() ? 1 : 0;
}

// Writes av_vels.dat: "%d:\t%.12E\n" per step (d2q9-bgk.c:1136).
int tpulbm_write_av_vels(const char* path, int n, const float* av_vels) {
  BufferedFile out(path, 1 << 20);
  if (!out.fp) return 1;
  for (int i = 0; i < n; ++i) {
    if (fprintf(out.fp, "%d:\t%.12E\n", i, (double)av_vels[i]) < 0) {
      return 1;
    }
  }
  return out.close() ? 1 : 0;
}

// Parses the sparse "x y 1" obstacle list into a dense int32 grid; returns
// the number of free cells, or -1 on error. Duplicate entries count once
// (d2q9-bgk.c:945-947).
long long tpulbm_read_obstacles(const char* path, int nx, int ny,
                                int* mask_out) {
  FILE* fp = fopen(path, "r");
  if (!fp) return -1;
  memset(mask_out, 0, sizeof(int) * (size_t)nx * (size_t)ny);
  long long num_free = (long long)nx * ny;
  int xx, yy, blocked;
  int rc;
  while ((rc = fscanf(fp, "%d %d %d", &xx, &yy, &blocked)) != EOF) {
    if (rc != 3 || blocked != 1 || xx < 0 || xx >= nx || yy < 0 || yy >= ny) {
      fclose(fp);
      return -1;
    }
    long idx = (long)yy * nx + xx;
    if (!mask_out[idx]) --num_free;
    mask_out[idx] = 1;
  }
  fclose(fp);
  return num_free;
}

}  // extern "C"
