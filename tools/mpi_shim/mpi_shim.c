/* Single-rank MPI shim implementation; see mpi.h for scope. */
#include "mpi.h"

#include <stdlib.h>
#include <string.h>
#include <time.h>

int MPI_Init(int *argc, char ***argv) { (void)argc; (void)argv; return 0; }
int MPI_Finalize(void) { return 0; }
int MPI_Abort(MPI_Comm c, int code) { (void)c; exit(code ? code : 1); }
int MPI_Comm_rank(MPI_Comm c, int *rank) { (void)c; *rank = 0; return 0; }
int MPI_Comm_size(MPI_Comm c, int *size) { (void)c; *size = 1; return 0; }
int MPI_Barrier(MPI_Comm c) { (void)c; return 0; }

double MPI_Wtime(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

int MPI_Bcast(void *b, int n, MPI_Datatype dt, int root, MPI_Comm c) {
  (void)b; (void)n; (void)dt; (void)root; (void)c;
  return 0; /* root's data is already in place on the only rank */
}

static void copy_if_needed(const void *send, void *recv, int count,
                           MPI_Datatype dt) {
  if (send != MPI_IN_PLACE && send != recv && count > 0)
    memcpy(recv, send, (size_t)count * (size_t)dt);
}

int MPI_Reduce(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op op,
               int root, MPI_Comm c) {
  (void)op; (void)root; (void)c;
  copy_if_needed(s, r, n, dt);
  return 0;
}

int MPI_Allreduce(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op op,
                  MPI_Comm c) {
  (void)op; (void)c;
  copy_if_needed(s, r, n, dt);
  return 0;
}

int MPI_Exscan(const void *s, void *r, int n, MPI_Datatype dt, MPI_Op op,
               MPI_Comm c) {
  (void)s; (void)op; (void)c;
  /* Exscan on rank 0 leaves recvbuf undefined per the standard; HySortK adds
   * it to a zero-initialized offset, so the identity (0) is the safe value. */
  if (s != MPI_IN_PLACE && n > 0) memset(r, 0, (size_t)n * (size_t)dt);
  else if (s == MPI_IN_PLACE && n > 0) memset(r, 0, (size_t)n * (size_t)dt);
  return 0;
}

int MPI_Scatterv(const void *s, const int *counts, const int *displs,
                 MPI_Datatype st, void *r, int rcount, MPI_Datatype rt,
                 int root, MPI_Comm c) {
  (void)rcount; (void)rt; (void)root; (void)c;
  if (s != MPI_IN_PLACE && counts && counts[0] > 0)
    memcpy(r, (const char *)s + (size_t)(displs ? displs[0] : 0) * (size_t)st,
           (size_t)counts[0] * (size_t)st);
  return 0;
}

int MPI_Gather(const void *s, int scount, MPI_Datatype st, void *r, int rcount,
               MPI_Datatype rt, int root, MPI_Comm c) {
  (void)rcount; (void)rt; (void)root; (void)c;
  copy_if_needed(s, r, scount, st);
  return 0;
}

int MPI_Gatherv(const void *s, int scount, MPI_Datatype st, void *r,
                const int *rcounts, const int *displs, MPI_Datatype rt,
                int root, MPI_Comm c) {
  (void)rcounts; (void)rt; (void)root; (void)c;
  if (s != MPI_IN_PLACE && scount > 0)
    memcpy((char *)r + (size_t)(displs ? displs[0] : 0) * (size_t)st, s,
           (size_t)scount * (size_t)st);
  return 0;
}

int MPI_Alltoallv(const void *s, const int *scounts, const int *sdispls,
                  MPI_Datatype st, void *r, const int *rcounts,
                  const int *rdispls, MPI_Datatype rt, MPI_Comm c) {
  (void)rcounts; (void)rt; (void)c;
  if (scounts && scounts[0] > 0)
    memcpy((char *)r + (size_t)(rdispls ? rdispls[0] : 0) * (size_t)st,
           (const char *)s + (size_t)(sdispls ? sdispls[0] : 0) * (size_t)st,
           (size_t)scounts[0] * (size_t)st);
  return 0;
}

int MPI_Ialltoall(const void *s, int scount, MPI_Datatype st, void *r,
                  int rcount, MPI_Datatype rt, MPI_Comm c, MPI_Request *req) {
  (void)rcount; (void)rt; (void)c;
  copy_if_needed(s, r, scount, st);
  if (req) *req = 0;
  return 0;
}

int MPI_Wait(MPI_Request *req, MPI_Status *st) { (void)req; (void)st; return 0; }

int MPI_Type_contiguous(int count, MPI_Datatype oldtype, MPI_Datatype *nt) {
  *nt = (MPI_Datatype)(count * (int)oldtype);
  return 0;
}
int MPI_Type_commit(MPI_Datatype *dt) { (void)dt; return 0; }
int MPI_Type_free(MPI_Datatype *dt) { (void)dt; return 0; }

int MPI_File_open(MPI_Comm c, const char *filename, int amode, MPI_Info info,
                  MPI_File *fh) {
  (void)c; (void)amode; (void)info;
  *fh = fopen(filename, "rb");
  return *fh ? 0 : 1;
}
int MPI_File_close(MPI_File *fh) {
  if (fh && *fh) fclose(*fh);
  return 0;
}
int MPI_File_get_size(MPI_File fh, MPI_Offset *size) {
  long cur = ftell(fh);
  fseek(fh, 0, SEEK_END);
  *size = (MPI_Offset)ftell(fh);
  fseek(fh, cur, SEEK_SET);
  return 0;
}
int MPI_File_read_at_all(MPI_File fh, MPI_Offset off, void *buf, int count,
                         MPI_Datatype dt, MPI_Status *st) {
  (void)st;
  fseek(fh, (long)off, SEEK_SET);
  size_t got = fread(buf, 1, (size_t)count * (size_t)dt, fh);
  (void)got;
  return 0;
}
